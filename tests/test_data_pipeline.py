"""End-to-end data pipeline on a synthetic AVSP dataset tree: fold lists,
train/test window sampling, GT-nonzero rejection, audio windows, loader
batching + threaded prefetch, and one full train step on the loaded batch."""

import os
import wave

import numpy as np
import pytest


@pytest.fixture(scope="module")
def avsp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("AuViDataset")
    rng = np.random.default_rng(0)
    from PIL import Image
    import scipy.io

    n_frames = 40
    fps = 25.0
    for ds, video in [("AVAD", "v1"), ("DIEM", "d1")]:
        frames_dir = root / "video_frames" / ds / video
        maps_dir = root / "annotations" / ds / video / "maps"
        fix_dir = root / "annotations" / ds / video
        audio_dir = root / "video_audio" / ds / video
        for d in (frames_dir, maps_dir, audio_dir):
            os.makedirs(d)
        for i in range(1, n_frames + 1):
            img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(frames_dir / f"img_{i:05d}.jpg")
            gt = np.zeros((48, 64), np.uint8)
            gt[10:20, 20:40] = 200  # non-empty GT everywhere
            Image.fromarray(gt).save(maps_dir / f"eyeMap_{i:05d}.jpg")
            fix = np.zeros((48, 64), np.uint8)
            fix[12, 30] = 1
            scipy.io.savemat(fix_dir / f"fixMap_{i:05d}.mat", {"eyeMap": fix})
        # 2-second 8 kHz wav (resampled to 16k by the loader)
        wav = (rng.standard_normal(16000) * 3000).astype(np.int16)
        with wave.open(str(audio_dir / f"{video}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(wav.tobytes())
        # fold lists
        fold = root / "fold_lists"
        os.makedirs(fold, exist_ok=True)
        for mode in ("train", "test"):
            name = (f"DIEM_list_{mode}_fps.txt" if ds == "DIEM"
                    else f"{ds}_list_{mode}_1_fps.txt")
            with open(fold / name, "w") as f:
                f.write(f"{video} {n_frames} {fps}\n")
    return str(root)


def test_dataset_train_and_test_windows(avsp_root):
    from mspi_tpu.data.datasets import AudioVisualDataset

    train_ds = AudioVisualDataset(avsp_root, "AVAD", 1, 16, "train", True, (48, 64))
    assert len(train_ds) == 1
    s = train_ds[0]
    assert s.clip.shape == (16, 48, 64, 3) and s.clip.dtype == np.uint8
    assert s.audio.shape == (257, 111, 1)
    assert s.gt.shape == (48, 64) and s.gt.max() > 0

    test_ds = AudioVisualDataset(avsp_root, "AVAD", 1, 16, "test", True, (48, 64))
    # stride 2*16: windows at 0 only (40 - 16 = 24 -> range(0, 24, 32) = [0])
    assert len(test_ds) == 1
    v, start = test_ds.list_num_frame[0]
    assert (v, start) == ("v1", 0)


def test_concat_and_loader(avsp_root):
    from mspi_tpu.data.datasets import build_training_datasets
    from mspi_tpu.data.loader import DataLoader

    train, val = build_training_datasets(avsp_root, 1, 16, True, (48, 64),
                                         datasets=("AVAD", "DIEM"))
    assert len(train) == 2
    loader = DataLoader(train, batch_size=2, shuffle=True, drop_last=True,
                        num_workers=2)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["clips"].shape == (2, 16, 48, 64, 3)
    assert b["audio"].shape == (2, 257, 111, 1)
    assert b["gt"].shape == (2, 48, 64)


def test_fixations_loading(avsp_root):
    from mspi_tpu.data.datasets import AudioVisualDataset

    ds = AudioVisualDataset(avsp_root, "AVAD", 1, 16, "test", True, (48, 64),
                            load_fixations=True)
    s = ds[0]
    assert s.fixation is not None and s.fixation.shape == (48, 64)
    assert s.fixation.sum() >= 1


def test_train_step_on_loaded_batch(avsp_root):
    """Full loop closure: dataset -> loader -> device normalise -> jitted
    train step (s3d backbone at 64x96)."""
    import jax.numpy as jnp

    from mspi_tpu.config import get_config
    from mspi_tpu.data.datasets import AudioVisualDataset
    from mspi_tpu.data.loader import DataLoader
    from mspi_tpu.data.video import normalize_clip_jax
    from mspi_tpu.models.fusion import AudioVisualSaliencyModel
    from mspi_tpu.train.engine import (create_train_state, make_optimizer,
                                       make_train_step)
    import jax

    ds = AudioVisualDataset(avsp_root, "AVAD", 1, 16, "test", True, (64, 96))
    loader = DataLoader(ds, batch_size=1, num_workers=1)
    batch = next(iter(loader))

    cfg = get_config("s3d", overrides={"data": {"resolution": (64, 96)}})
    model = AudioVisualSaliencyModel(cfg=cfg)
    clips = normalize_clip_jax(jnp.asarray(batch["clips"]))
    audio = jnp.asarray(batch["audio"])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), clips, audio)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx)
    step = make_train_step(model, tx, gamma=1.0, donate=False)
    state, metrics = step(state, {"clips": clips, "audio": audio,
                                  "gt": jnp.asarray(batch["gt"])}, 1e-4)
    assert np.isfinite(float(metrics["loss"]))


def test_prefetch_to_device():
    from mspi_tpu.data.loader import prefetch_to_device

    batches = [{"x": np.full((2, 3), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert hasattr(b["x"], "devices")  # committed to a device
        np.testing.assert_allclose(np.asarray(b["x"]), i)
