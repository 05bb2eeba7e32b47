"""Inference CLI pieces: sliding-window job order (incl. the temporal-flip
trick), post-processing parity with the reference's blur/exp/resize/minmax,
and checkpoint save/auto-resume roundtrip."""

import numpy as np
import pytest


def test_sliding_window_jobs_cover_all_frames():
    from inference import sliding_window_jobs

    n, L = 40, 16
    jobs = sliding_window_jobs(n, L)
    outputs = {}
    for s, flipped, out_idx in jobs:
        outputs[out_idx] = (s, flipped)
    # every frame gets exactly one output
    assert set(outputs) == set(range(n))
    # frames 0..14 come from flipped windows; 15.. from normal windows
    for i in range(L - 1):
        s, flipped = outputs[i]
        assert flipped and s == i  # flipped window starting at that frame
    for i in range(L - 1, n):
        s, flipped = outputs[i]
        assert not flipped and s == i - L + 1


def test_blur_exp_resize_matches_reference_postprocess(rng):
    import cv2

    from inference import blur_exp_resize

    pred = np.log(rng.random((224, 384)).astype(np.float32) + 1e-3)
    ours = blur_exp_resize(pred)
    # reference: blur -> exp -> resize -> minmax -> round (inference.py:72-89)
    ref = cv2.GaussianBlur(pred, (11, 11), 0)
    ref = np.exp(ref)
    ref = cv2.resize(ref, (640, 480))
    ref = (ref - ref.min()) / (ref.max() - ref.min())
    ref = np.round(ref * 255).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)
    assert ours.shape == (480, 640)


def test_checkpoint_save_resume_roundtrip(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from mspi_tpu.config import get_config
    from mspi_tpu.models.fusion import AudioVisualSaliencyModel
    from mspi_tpu.train import checkpoints as ckpt_lib
    from mspi_tpu.train.engine import create_train_state, make_optimizer

    cfg = get_config("s3d", overrides={"data": {"resolution": (64, 96)}})
    model = AudioVisualSaliencyModel(cfg=cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 96, 3)),
        jnp.zeros((1, 257, 111, 1)))
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx)

    ckpt_dir = str(tmp_path / "checkpoints")
    ckpt_lib.save_checkpoint(ckpt_dir, state, epoch=7)
    assert ckpt_lib.latest_checkpoint(ckpt_dir).endswith("ckpt_7")
    ckpt_lib.save_checkpoint(ckpt_dir, state, epoch=12)
    latest = ckpt_lib.latest_checkpoint(ckpt_dir)
    assert latest.endswith("ckpt_12")

    restored, epoch = ckpt_lib.restore_checkpoint(latest, state)
    assert epoch == 12
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.array(a), np.array(b))


def test_device_post_matches_cv2(rng):
    """--device_post: the batched on-device blur/exp/resize/minmax pipeline
    matches the host cv2 path within one uint8 rounding step."""
    from inference import blur_exp_resize, make_device_post

    pred = (rng.standard_normal((3, 224, 384)) * 0.5).astype(np.float32)
    host = np.stack([blur_exp_resize(p) for p in pred])
    dev = np.asarray(make_device_post()(pred))
    assert dev.shape == host.shape and dev.dtype == np.uint8
    assert np.abs(host.astype(int) - dev.astype(int)).max() <= 1

    # Ill-conditioned real-world case: log-density preds sit at ~log(1/(h*w))
    # ~= -11.4 with a total dynamic range of ~0.03 — far below one bf16 ulp
    # at that offset.  On TPU the blur einsums run at default (bf16) matmul
    # precision unless forced HIGHEST; without mean-centering + HIGHEST this
    # flattened every map into quantization plateaus (CC -0.20 vs the host
    # path in the round-3 northstar run).
    pred = (-11.37 + 0.015 * rng.standard_normal((2, 224, 384))).astype(np.float32)
    host = np.stack([blur_exp_resize(p) for p in pred])
    dev = np.asarray(make_device_post()(pred))
    assert np.abs(host.astype(int) - dev.astype(int)).max() <= 1
