"""Metric parity vs independent torch implementations of the reference's
conventions (utils/compute_saliency_metrics.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mspi_tpu.train import metrics
from mspi_tpu.train.loss import sal_loss

EPS = 2.2204e-16


def torch_kldiv(s_map, gt):
    b = s_map.size(0)
    s = s_map.reshape(b, -1)
    g = gt.reshape(b, -1)
    s = s / s.sum(1, keepdim=True)
    g = g / g.sum(1, keepdim=True)
    return (g * torch.log(EPS + g / (s + EPS))).sum(1).mean()


def torch_cc(s_map, gt):
    b = s_map.size(0)
    s = s_map.reshape(b, -1)
    g = gt.reshape(b, -1)
    s = (s - s.mean(1, keepdim=True)) / s.std(1, keepdim=True)
    g = (g - g.mean(1, keepdim=True)) / g.std(1, keepdim=True)
    ab = (s * g).sum(1)
    aa = (s * s).sum(1)
    bb = (g * g).sum(1)
    return (ab / torch.sqrt(aa * bb)).mean()


def torch_sim(s_map, gt):
    b = s_map.size(0)

    def norm(x):
        f = x.reshape(b, -1)
        mn = f.min(1, keepdim=True)[0]
        mx = f.max(1, keepdim=True)[0]
        f = (f - mn) / (mx - mn)
        return f / f.sum(1, keepdim=True)

    return torch.minimum(norm(s_map), norm(gt)).sum(1).mean()


def torch_nss(s_map, gt):
    b = s_map.size(0)
    s = s_map.reshape(b, -1)
    g = gt.reshape(b, -1)
    s = (s - s.mean(1, keepdim=True)) / (s.std(1, keepdim=True) + EPS)
    return ((s * g).sum(1) / g.sum(1)).mean()


@pytest.fixture
def maps(rng):
    pred = rng.random((4, 56, 96)).astype(np.float32) + 0.01
    gt = rng.random((4, 56, 96)).astype(np.float32)
    gt[gt < 0.8] = 0.0  # sparse-ish ground truth
    gt = gt + 1e-3
    return pred, gt


def test_kldiv(maps):
    pred, gt = maps
    ours = float(metrics.kldiv(jnp.array(pred), jnp.array(gt)))
    ref = float(torch_kldiv(torch.tensor(pred), torch.tensor(gt)))
    assert abs(ours - ref) < 1e-5


def test_cc(maps):
    pred, gt = maps
    ours = float(metrics.cc(jnp.array(pred), jnp.array(gt)))
    ref = float(torch_cc(torch.tensor(pred), torch.tensor(gt)))
    assert abs(ours - ref) < 1e-5


def test_similarity(maps):
    pred, gt = maps
    ours = float(metrics.similarity(jnp.array(pred), jnp.array(gt)))
    ref = float(torch_sim(torch.tensor(pred), torch.tensor(gt)))
    assert abs(ours - ref) < 1e-5


def test_nss(maps, rng):
    pred, _ = maps
    fix = (rng.random((4, 56, 96)) > 0.99).astype(np.float32)
    ours = float(metrics.nss(jnp.array(pred), jnp.array(fix)))
    ref = float(torch_nss(torch.tensor(pred), torch.tensor(fix)))
    assert abs(ours - ref) < 1e-5


def test_sal_loss_combines_kld_minus_cc(maps):
    pred, gt = maps
    log_pred = jnp.log(jnp.array(pred))
    loss, aux = sal_loss(log_pred, jnp.array(gt))
    assert abs(float(loss) - (float(aux["kl"]) - float(aux["cc"]))) < 1e-6
    tp = torch.tensor(pred)
    tg = torch.tensor(gt)
    ref = float(torch_kldiv(tp, tg) - torch_cc(tp, tg))
    assert abs(float(loss) - ref) < 1e-5


def test_ig_self_is_zero(maps):
    pred, gt = maps
    v = float(metrics.ig(jnp.array(pred), jnp.array(gt), jnp.array(pred)))
    assert abs(v) < 1e-6


def test_auc_judd_perfect_prediction(rng):
    # saliency == smoothed fixations should give high AUC
    fix = np.zeros((64, 64))
    pts = rng.integers(0, 64, size=(20, 2))
    fix[pts[:, 0], pts[:, 1]] = 1
    import cv2

    sal = cv2.GaussianBlur(fix, (15, 15), 3)
    score = metrics.auc_judd(sal, fix, rng=rng)
    assert score > 0.9
    # random saliency ~ 0.5
    rand_score = metrics.auc_judd(rng.random((64, 64)), fix, rng=rng)
    assert 0.3 < rand_score < 0.7
