"""Framework-surface tests: LR policies vs the reference lr_policy.py
formulas, optimizer wd partition, top-k metrics, meters, multi-view test
ensembling, classification heads, and the Kinetics-style sampling utils."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from mspi_tpu.train.optim import (construct_optimizer, cosine_scheduler,
                                  lr_cosine, lr_steps_with_relative_lrs, wd_mask)
from mspi_tpu.utils.meters import (EpochTimer, TestMeter, TrainMeter, ValMeter,
                                   topk_accuracies, topk_errors)


def test_lr_cosine_matches_reference_formula():
    # lr_policy.py: cosine with warmup (SLOWFAST_4x16_R50.yaml numbers)
    base, end, max_epoch, warmup, warm_start = 0.1, 0.0, 196, 34.0, 0.01
    pol = lr_cosine(base, end, max_epoch, warmup, warm_start)

    def ref(epoch):
        def cos(e):
            return end + (base - end) * (math.cos(math.pi * e / max_epoch) + 1.0) * 0.5

        if epoch < warmup:
            alpha = (cos(warmup) - warm_start) / warmup
            return warm_start + epoch * alpha
        return cos(epoch)

    for e in [0, 5.5, 33.9, 34.0, 100, 195.9]:
        assert abs(pol(e) - ref(e)) < 1e-9, e


def test_lr_steps():
    pol = lr_steps_with_relative_lrs(0.1, [1, 0.1, 0.01], [0, 30, 60], 90)
    assert abs(pol(10) - 0.1) < 1e-12
    assert abs(pol(45) - 0.01) < 1e-12
    assert abs(pol(80) - 0.001) < 1e-12


def test_cosine_scheduler_shape():
    s = cosine_scheduler(1e-3, 1e-5, epochs=10, niter_per_ep=7, warmup_epochs=2)
    assert len(s) == 70
    assert s[0] == 0.0 and abs(s[14] - 1e-3) < 1e-4
    assert s[-1] <= 1.1e-5 + 1e-6


def test_wd_mask_excludes_1d():
    params = {"conv": {"kernel": jnp.zeros((3, 3, 4, 8)), "bias": jnp.zeros(8)},
              "bn": {"scale": jnp.ones(8), "bias": jnp.zeros(8)}}
    mask = wd_mask(params)
    assert mask["conv"]["kernel"] is True
    assert mask["conv"]["bias"] is False
    assert mask["bn"]["scale"] is False


def test_construct_optimizer_variants():
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
    grads = {"w": jnp.ones((4, 4)), "b": jnp.ones(4)}
    for method in ("sgd", "adam", "adamw", "lars"):
        tx = construct_optimizer(params, method, 0.1, weight_decay=1e-4)
        st = tx.init(params)
        updates, _ = tx.update(grads, st, params)
        assert all(np.all(np.isfinite(u)) for u in jax.tree.leaves(updates))


def test_topk():
    preds = np.array([[0.1, 0.5, 0.4], [0.9, 0.05, 0.05]])
    labels = np.array([1, 2])
    t1, t5 = topk_errors(preds, labels, (1, 2))
    assert abs(t1 - 50.0) < 1e-6  # sample0 correct, sample1 wrong
    a1, = topk_accuracies(preds, labels, (1,))
    assert abs(a1 - 50.0) < 1e-6


def test_train_val_meters():
    m = TrainMeter(epoch_iters=4)
    for _ in range(4):
        m.update_stats(20.0, 5.0, 0.5, 0.1, 8)
    stats = m.get_epoch_stats(0)
    assert abs(stats["top1_err"] - 20.0) < 1e-6
    v = ValMeter(max_iter=2)
    v.update_stats(30.0, 10.0, 8)
    assert abs(v.get_epoch_stats(0)["top1_err"] - 30.0) < 1e-6


def test_testmeter_multiview_ensemble():
    # 2 videos x 3 clips; clips of video 0 vote for class 1
    m = TestMeter(num_videos=2, num_clips=3, num_cls=4)
    for c in range(3):
        m.update_stats(np.array([[0.0, 1.0, 0.0, 0.0]]), np.array([1]),
                       np.array([c]))
        m.update_stats(np.array([[0.0, 0.0, 0.2, 0.8]]), np.array([3]),
                       np.array([3 + c]))
    stats = m.finalize_metrics()
    assert stats["top1_acc"] == 100.0


def test_heads_shapes():
    from mspi_tpu.models.heads import ResNetBasicHead, TransformerBasicHead, X3DHead

    rng = jax.random.PRNGKey(0)
    h = ResNetBasicHead(dim_in=[32, 8], num_classes=10)
    v = h.init(rng, [jnp.zeros((2, 4, 7, 7, 32)), jnp.zeros((2, 16, 7, 7, 8))])
    out = h.apply(v, [jnp.zeros((2, 4, 7, 7, 32)), jnp.zeros((2, 16, 7, 7, 8))])
    assert out.shape == (2, 10)

    xh = X3DHead(dim_in=24, dim_inner=54, dim_out=64, num_classes=10)
    v = xh.init(rng, [jnp.zeros((2, 4, 7, 7, 24))])
    out = xh.apply(v, [jnp.zeros((2, 4, 7, 7, 24))])
    assert out.shape == (2, 10)

    th = TransformerBasicHead(dim_in=32, num_classes=10)
    v = th.init(rng, jnp.zeros((2, 8, 7, 7, 32)))
    assert th.apply(v, jnp.zeros((2, 8, 7, 7, 32))).shape == (2, 10)


def test_kinetics_sampling_utils(rng):
    from mspi_tpu.data.kinetics import (get_start_end_idx, spatial_resize_crop,
                                        temporal_sampling)

    idx = temporal_sampling(100, 0, 63, 16)
    assert idx.shape == (16,) and idx[0] == 0 and idx[-1] == 63
    s, e = get_start_end_idx(300, 64, 0, 10)
    assert s == 0.0
    s2, _ = get_start_end_idx(300, 64, 9, 10)
    assert abs(s2 - 236.0) < 1e-6

    frames = (rng.random((4, 120, 160, 3)) * 255).astype(np.uint8)
    out = spatial_resize_crop(frames, 128, 160, 112, spatial_idx=-1, rng=rng)
    assert out.shape == (4, 112, 112, 3)
    out = spatial_resize_crop(frames, 128, 128, 112, spatial_idx=1)
    assert out.shape == (4, 112, 112, 3)
