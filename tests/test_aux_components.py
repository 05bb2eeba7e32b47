"""Aux component tests: augmentations, multigrid schedule, SSL losses,
masked pretraining utilities, Grad-CAM plumbing, precise-BN recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from mspi_tpu.data.augment import (cutmix_batch, mixup_batch, one_hot_smooth,
                                   random_erasing)
from mspi_tpu.models.contrastive import (byol_loss, moco_loss, momentum_update,
                                         nt_xent_loss, queue_update, sinkhorn,
                                         swav_loss)
from mspi_tpu.train.multigrid import MultigridSchedule, short_cycle_crops


def test_mixup_cutmix(rng):
    key = jax.random.PRNGKey(0)
    clips = jnp.asarray(rng.random((4, 2, 16, 16, 3)).astype(np.float32))
    labels = jnp.array([0, 1, 2, 3])
    mixed, targets = mixup_batch(key, clips, labels, num_classes=5)
    assert mixed.shape == clips.shape and targets.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, atol=1e-5)

    mixed, targets = cutmix_batch(key, clips, labels, num_classes=5)
    assert mixed.shape == clips.shape
    np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, atol=1e-5)


def test_one_hot_smooth():
    y = one_hot_smooth(jnp.array([1]), 4, smoothing=0.1)
    np.testing.assert_allclose(np.asarray(y[0]),
                               [0.025, 0.925, 0.025, 0.025], atol=1e-6)


def test_random_erasing(rng):
    clips = jnp.ones((2, 2, 32, 32, 3))
    out = random_erasing(jax.random.PRNGKey(1), clips, prob=1.0)
    assert out.shape == clips.shape
    assert float(jnp.abs(out - 1.0).max()) > 0  # something got erased


def test_multigrid_schedule():
    sched = MultigridSchedule()
    shapes = sched.long_cycle_shapes(16, 224, 8)
    assert shapes[-1] == (8, 16, 224)
    assert all(b >= 8 for b, _, _ in shapes)  # smaller shapes -> bigger batch
    plan = sched.schedule(30, 16, 224, 8)
    assert plan[-1][1:] == (8, 16, 224)
    b, t, c = sched.get_current(plan, 0)
    assert (b, t, c) == plan[0][1:]
    crops = short_cycle_crops(224)
    assert crops[-1] == 224 and len(crops) == 3


def test_ssl_losses(rng):
    z1 = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    z2 = z1 + 0.01 * jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    z_rand = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    # aligned views give lower loss than random pairs
    assert float(nt_xent_loss(z1, z2)) < float(nt_xent_loss(z1, z_rand))
    queue = jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))
    assert float(moco_loss(z1, z1, queue)) < float(moco_loss(z1, z_rand, queue))
    assert float(byol_loss(z1, z1, z1, z1)) < 1e-5
    protos = jnp.asarray(rng.standard_normal((12, 16)).astype(np.float32))
    assert np.isfinite(float(swav_loss(z1, z2, protos)))
    # SwAV feeds cosine scores (normalised embeddings) into sinkhorn
    z1n = z1 / jnp.linalg.norm(z1, axis=-1, keepdims=True)
    pn = protos / jnp.linalg.norm(protos, axis=-1, keepdims=True)
    q = sinkhorn(z1n @ pn.T)
    np.testing.assert_allclose(np.asarray(q.sum(-1)), 1.0, atol=1e-3)


def test_momentum_and_queue(rng):
    online = {"w": jnp.ones((3,))}
    target = {"w": jnp.zeros((3,))}
    updated = momentum_update(online, target, m=0.9)
    np.testing.assert_allclose(np.asarray(updated["w"]), 0.1, atol=1e-6)
    queue = jnp.zeros((8, 4))
    keys = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
    queue, ptr = queue_update(queue, keys, jnp.array(6))
    assert int(ptr) == 0  # wrapped
    assert float(jnp.abs(queue[6:]).sum()) > 0


def test_masked_pretraining(rng):
    from mspi_tpu.models.masked import masked_prediction_loss, random_patch_mask

    mask = random_patch_mask(jax.random.PRNGKey(0), 2, (4, 8, 8), 0.4)
    assert mask.shape == (2, 4, 8, 8)
    frac = float(mask.mean())
    assert 0.3 < frac < 0.5
    pred = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 96)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 96)).astype(np.float32))
    loss = masked_prediction_loss(pred, target, mask.astype(jnp.float32))
    assert np.isfinite(float(loss))
    # exact prediction of the normalised target -> zero loss
    mu = target.mean(-1, keepdims=True)
    sd = target.std(-1, keepdims=True) + 1e-6
    assert float(masked_prediction_loss((target - mu) / sd, target,
                                        mask.astype(jnp.float32))) < 1e-9


def test_hog_parity_vs_reference(rng):
    """hog_per_frame matches the reference torch HOGLayerC exactly
    (SlowFast/operators.py:66-122), including the atan2(gx,gy) convention,
    reflect padding, cell sum pooling and per-cell L2 normalisation."""
    import torch

    from mspi_tpu.models.masked import hog_per_frame
    from tests.reference_utils import install_operator_stubs

    install_operator_stubs()
    from SlowFast.operators import HOGLayerC

    frames = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(hog_per_frame(jnp.asarray(frames), nbins=9, cell=8))
    with torch.no_grad():
        ref = HOGLayerC(nbins=9, pool=8)(
            torch.from_numpy(frames.transpose(0, 3, 1, 2)))
    # ref: [B, 3, nbins, h, w] -> [B, h, w, 3, nbins]
    ref = ref.permute(0, 3, 4, 1, 2).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_masked_hog_targets(rng):
    from mspi_tpu.models.masked import hog_targets, masked_prediction_loss

    clips = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)).astype(np.float32))
    t = hog_targets(clips, temporal_stride=2, spatial_stride=16, cell=8)
    assert t.shape == (2, 2, 2, 2, 3 * 9 * 4)
    # per-cell L2 norm == 1 for every (channel, cell) bin histogram
    hist = np.asarray(t).reshape(2, 2, 2, 2, 27, 4)
    norms = np.linalg.norm(hist.reshape(2, 2, 2, 2, 3, 9, 4), axis=5)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # plain-MSE path: exact prediction -> zero loss
    mask = jnp.ones((2, 2, 2, 2), jnp.float32)
    assert float(masked_prediction_loss(t, t, mask,
                                        normalize_target=False)) < 1e-9


def test_grad_cam_on_toy_model(rng):
    from mspi_tpu.utils.visualization import grad_cam

    w = jnp.asarray(rng.standard_normal((6, 5)).astype(np.float32))

    def backbone_apply(clips):
        return [clips]  # identity "features" [B,T,H,W,C]

    def head_apply(feats):
        pooled = feats[0].mean(axis=(1, 2, 3))
        return pooled @ w

    clips = jnp.asarray(rng.random((2, 2, 4, 4, 6)).astype(np.float32))
    cam, scores = grad_cam(backbone_apply, head_apply, clips)
    assert cam.shape == (2, 2, 4, 4)
    assert float(cam.min()) >= 0.0 and float(cam.max()) <= 1.0 + 1e-6
    assert scores.shape == (2, 5)


def test_scalar_writer(tmp_path):
    from mspi_tpu.utils.visualization import ScalarWriter

    w = ScalarWriter(str(tmp_path))
    w.add_scalars({"loss": 1.0}, 0)
    w.add_histogram("weights", np.random.randn(100), 0)
    cm = w.plot_confusion_matrix(np.array([0, 1]), np.array([0, 0]), 2, 0)
    assert cm[0, 0] == 1 and cm[0, 1] == 1
    assert (tmp_path / "scalars.jsonl").exists()


def test_video_visualizer_boxes(rng):
    from mspi_tpu.utils.visualization import VideoVisualizer

    vis = VideoVisualizer(num_classes=5, class_names=list("abcde"), top_k=2)
    frames = (rng.random((3, 48, 64, 3)) * 60).astype(np.uint8)
    boxes = np.array([[4, 4, 30, 40], [32, 8, 60, 44]], np.float32)
    preds = np.array([[0.1, 0.9, 0, 0, 0], [0, 0, 0.2, 0.8, 0]], np.float32)
    out = vis.draw_clip(frames, preds, bboxes=boxes)
    assert out.shape == frames.shape and out.dtype == np.uint8
    assert (out != frames).any(), "boxes should modify pixels"
    # box edge pixels carry the class color (bright vs the dim background)
    assert out[0, 4, 4:30].max() > 120

    # clip-level text mode on the keyframe only
    out2 = vis.draw_clip(frames, preds[0], keyframe_idx=1)
    assert (out2[1] != frames[1]).any()
    assert (out2[0] == frames[0]).all()
