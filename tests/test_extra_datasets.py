"""SSv2 / Charades / ImageNet dataset variants on synthetic trees."""

import json
import os

import numpy as np
import pytest


def _write_frames(d, n, rng, size=(64, 80)):
    from PIL import Image

    os.makedirs(d, exist_ok=True)
    for i in range(n):
        img = (rng.random((*size, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(d, f"{i:06d}.jpg"))


def test_segment_indices():
    from mspi_tpu.data.extra_datasets import segment_indices

    rng = np.random.default_rng(0)
    idx = segment_indices(100, 8, train=False, rng=rng)
    assert len(idx) == 8 and idx[0] < idx[-1] < 100
    idx_t = segment_indices(100, 8, train=True, rng=rng)
    assert np.all(np.diff(idx_t) >= 0) and idx_t.max() < 100
    # fewer frames than segments still valid
    short = segment_indices(4, 8, train=False, rng=rng)
    assert short.max() <= 3


def test_ssv2(tmp_path, rng):
    from mspi_tpu.data.extra_datasets import SSv2Frames

    root = tmp_path / "ssv2"
    os.makedirs(root)
    with open(root / "labels.json", "w") as f:
        json.dump({"pushing something": 0, "pulling something": 1}, f)
    with open(root / "train.json", "w") as f:
        json.dump([{"id": "123", "template": "[pushing] something"}], f)
    _write_frames(str(root / "frames" / "123"), 20, rng)

    ds = SSv2Frames(str(root), "train", num_frames=8, crop_size=56,
                    jitter_scales=(64, 72))
    assert len(ds) == 1
    s = ds[0]
    assert s.clip.shape == (8, 56, 56, 3)
    assert int(s.label) == 0


def test_charades(tmp_path, rng):
    from mspi_tpu.data.extra_datasets import CharadesFrames

    root = tmp_path / "charades"
    os.makedirs(root)
    with open(root / "train.csv", "w") as f:
        f.write("VID1,24.0,c005 0.0 2.0;c083 1.0 3.0\n")
    _write_frames(str(root / "frames" / "VID1"), 48, rng)

    ds = CharadesFrames(str(root), "train", num_frames=4, sampling_rate=2,
                        crop_size=56, jitter_scales=(64, 72))
    s = ds[0]
    assert s.clip.shape == (4, 56, 56, 3)
    assert s.label.shape == (157,)
    assert s.label[5] == 1.0 and s.label[83] == 1.0 and s.label.sum() == 2.0


def test_imagenet_folder(tmp_path, rng):
    from mspi_tpu.data.extra_datasets import ImageNetFolder
    from PIL import Image

    for cls in ("cat", "dog"):
        d = tmp_path / "train" / cls
        os.makedirs(d)
        img = (rng.random((80, 90, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(d / "a.jpg")

    ds = ImageNetFolder(str(tmp_path), "train", crop_size=56,
                        jitter_scales=(64, 72))
    assert len(ds) == 2
    s = ds[0]
    assert s.clip.shape == (56, 56, 3)
    assert ds.class_to_idx == {"cat": 0, "dog": 1}
