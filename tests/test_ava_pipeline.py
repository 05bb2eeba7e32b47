"""AVA detection pipeline: dataset parsing/transform semantics (vs the
reference ava_helper/ava_dataset behavior) + an end-to-end train/eval run
on a synthetic AVA directory tree."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mspi_tpu.data.ava import (AVA_VALID_FRAMES, AvaDataset, get_sequence,
                               load_image_lists, parse_bboxes_file,
                               sec_to_frame)


@pytest.fixture(scope="module")
def ava_tree(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("ava")
    frame_dir = root / "frames"
    list_dir = root / "frame_lists"
    ann_dir = root / "annotations"
    for d in (frame_dir, list_dir, ann_dir):
        d.mkdir()
    rng = np.random.default_rng(0)
    n_frames = 150
    header = "original_vido_id video_id frame_id path labels\n"
    train_lines, val_lines = [header], [header]
    for vi, vid in enumerate(("vidA", "vidB")):
        (frame_dir / vid).mkdir()
        for i in range(n_frames):
            img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
            path = f"{vid}/{vid}_{i:06d}.jpg"
            cv2.imwrite(str(frame_dir / path), img)
            line = f'{vid} {vi} {i} {path} ""\n'
            train_lines.append(line)
            val_lines.append(line)
    (list_dir / "train.csv").write_text("".join(train_lines))
    (list_dir / "val.csv").write_text("".join(val_lines))

    # GT boxes: sec 902 and 904 for vidA (904 % 4 == 0 survives val
    # subsampling; 902 does not), sec 904 for vidB; one box has two labels.
    gt = [
        "vidA,902,0.1,0.1,0.5,0.5,7\n",
        "vidA,904,0.2,0.2,0.6,0.7,12\n",
        "vidA,904,0.2,0.2,0.6,0.7,25\n",   # same box, second label
        "vidB,904,0.3,0.1,0.9,0.8,3\n",
    ]
    (ann_dir / "gt.csv").write_text("".join(gt))
    # predicted boxes for val/test with scores (one below threshold)
    pred = [
        "vidA,904,0.2,0.2,0.6,0.7,,0.95\n",
        "vidA,904,0.0,0.0,0.2,0.2,,0.10\n",  # filtered by thresh 0.9
        "vidB,904,0.3,0.1,0.9,0.8,,0.99\n",
    ]
    (ann_dir / "pred.csv").write_text("".join(pred))
    return dict(frame_list_dir=str(list_dir), frame_dir=str(frame_dir),
                annotation_dir=str(ann_dir))


def test_parse_bboxes_and_keyframes(ava_tree):
    boxes, count, uniq = parse_bboxes_file(
        [os.path.join(ava_tree["annotation_dir"], "gt.csv")], [True], 0.9)
    assert uniq == 3  # the duplicate box is merged
    assert count == 4
    assert [b[1] for b in boxes["vidA"][904]] == [[12, 25]]
    assert sec_to_frame(902) == 60
    assert 902 in AVA_VALID_FRAMES and 1799 not in AVA_VALID_FRAMES


def test_get_sequence_clamps():
    seq = get_sequence(2, 8, 2, num_frames=100)
    assert len(seq) == 8
    assert seq[0] == 0 and max(seq) <= 99


def _make_ds(ava_tree, split, **kw):
    return AvaDataset(
        split=split, train_lists=("train.csv",), test_lists=("val.csv",),
        train_gt_box_lists=("gt.csv",), test_predict_box_lists=("pred.csv",),
        num_frames=4, sampling_rate=2, crop_size=32, jitter_scales=(36, 44),
        max_boxes=4, full_test_on_val=True, **ava_tree, **kw)


def test_train_dataset_semantics(ava_tree):
    ds = _make_ds(ava_tree, "train")
    # keyframes: vidA sec 902 + 904, vidB sec 904
    assert len(ds) == 3
    s = ds[0]
    assert s["clips"].shape == (4, 32, 32, 3)
    assert s["boxes"].shape == (4, 4) and s["labels"].shape == (4, 80)
    assert s["box_mask"].sum() == 1
    # label 7 -> index 6 (AVA labels are 1-based, ava_dataset.py:423-428)
    assert s["labels"][0, 6] == 1
    s2 = ds[1]
    assert s2["box_mask"].sum() == 1 and s2["labels"][0, 11] == 1 \
        and s2["labels"][0, 24] == 1
    assert s2["metadata"][0].tolist() == [0, 904]


def test_val_dataset_uses_pred_boxes_and_thresh(ava_tree):
    ds = _make_ds(ava_tree, "val")
    assert len(ds) == 2  # one surviving pred box per video at sec 904
    s = ds[0]
    assert s["box_mask"].sum() == 1  # the 0.10-score box was filtered
    assert s["labels"].sum() == 0    # pred boxes carry no labels
    # boxes scaled to the 32-crop, inside the image
    b = s["boxes"][0]
    assert 0 <= b[0] <= b[2] <= 31 and 0 <= b[1] <= b[3] <= 31


class TinyTrunk(nn.Module):
    """Stride-16 toy pyramid trunk for fast end-to-end detection tests."""

    @nn.compact
    def __call__(self, clips, train=False):
        x = nn.Conv(8, (1, 4, 4), strides=(1, 4, 4))(clips)
        x = nn.relu(x)
        x = nn.Conv(8, (1, 2, 2), strides=(1, 2, 2))(x)
        v3 = nn.relu(nn.Conv(16, (1, 2, 2), strides=(1, 2, 2))(x))
        return [x, x, v3, v3]


def test_detection_train_and_eval_end_to_end(ava_tree):
    import optax

    from mspi_tpu.train.detection import (VideoDetector, create_det_state,
                                          make_det_eval_step,
                                          make_det_train_step, run_ava_eval)

    ds = _make_ds(ava_tree, "train")
    batch = {k: jnp.asarray(np.stack([ds[i][k] for i in range(2)]))
             for k in ds[0]}
    model = VideoDetector(trunk=TinyTrunk(), dim_in=16, num_classes=80,
                          spatial_scale=1.0 / 16, pool_size=2,
                          dropout_rate=0.0)
    tx = optax.inject_hyperparams(optax.adamw)(learning_rate=1e-3,
                                               weight_decay=0.0)
    state = create_det_state(model, tx, batch)
    step = make_det_train_step(model, tx, jit=True)
    losses = []
    for _ in range(4):
        state, loss = step(state, batch, 1e-2)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses

    eval_step = make_det_eval_step(model)
    stats = run_ava_eval(state, eval_step, [batch])
    assert np.isfinite(stats["mAP"]) and 0.0 <= stats["mAP"] <= 1.0
    assert stats["num_classes_evaluated"] == 3  # labels 7, 12/25, 3
