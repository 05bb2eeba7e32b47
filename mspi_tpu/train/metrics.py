"""Saliency metrics as pure jnp functions (+ host-side numpy AUCs).

Re-implements the metric conventions of
/root/reference/utils/compute_saliency_metrics.py:9-308 exactly:
per-image sum-normalisation with eps=2.2204e-16 for KLD/IG, min-max then
sum normalisation for SIM, *unbiased* (ddof=1) std for CC/NSS — torch.std
defaults to Bessel's correction and matching it matters for parity tests.

The jnp metrics are jittable and batched; they run on TPU inside the train
step.  The threshold-sweep AUCs (AUC-Judd / shuffled AUC) are data-dependent
sweeps over fixation counts, so — like the reference, which computes them
offline — they stay host-side numpy.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

EPS = 2.2204e-16  # MATLAB eps, as in the reference


def _flat(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1)


def kldiv(s_map: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """KL divergence between per-image sum-normalised maps. [B,H,W] -> scalar."""
    s = _flat(s_map)
    g = _flat(gt)
    s = s / jnp.sum(s, axis=1, keepdims=True)
    g = g / jnp.sum(g, axis=1, keepdims=True)
    result = g * jnp.log(EPS + g / (s + EPS))
    return jnp.mean(jnp.sum(result, axis=1))


def normalize_map(s_map: jnp.ndarray) -> jnp.ndarray:
    """Per-image min-max normalisation (MIT code convention)."""
    s = _flat(s_map)
    mn = jnp.min(s, axis=1, keepdims=True)
    mx = jnp.max(s, axis=1, keepdims=True)
    return ((s - mn) / (mx - mn)).reshape(s_map.shape)


def similarity(s_map: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Histogram intersection of min-max + sum normalised maps."""
    s = _flat(normalize_map(s_map))
    g = _flat(normalize_map(gt))
    s = s / jnp.sum(s, axis=1, keepdims=True)
    g = g / jnp.sum(g, axis=1, keepdims=True)
    return jnp.mean(jnp.sum(jnp.minimum(s, g), axis=1))


def _std_unbiased(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.std(x, axis=1, keepdims=True, ddof=1)


def cc(s_map: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation after per-image standardisation (ddof=1 std)."""
    s = _flat(s_map)
    g = _flat(gt)
    s = (s - jnp.mean(s, axis=1, keepdims=True)) / _std_unbiased(s)
    g = (g - jnp.mean(g, axis=1, keepdims=True)) / _std_unbiased(g)
    ab = jnp.sum(s * g, axis=1)
    aa = jnp.sum(s * s, axis=1)
    bb = jnp.sum(g * g, axis=1)
    return jnp.mean(ab / jnp.sqrt(aa * bb))


def nss(s_map: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Normalized Scanpath Saliency: standardized map averaged at fixations."""
    s = _flat(s_map)
    g = _flat(gt)
    s = (s - jnp.mean(s, axis=1, keepdims=True)) / (_std_unbiased(s) + EPS)
    num = jnp.sum(s * g, axis=1)
    count = jnp.sum(g, axis=1)
    return jnp.mean(num / count)


def ig(s_map: jnp.ndarray, gt: jnp.ndarray, baseline: jnp.ndarray) -> jnp.ndarray:
    """Information gain of s_map over a baseline at GT locations."""
    s = _flat(s_map)
    g = _flat(gt)
    b = _flat(baseline)
    s = s / jnp.sum(s, axis=1, keepdims=True)
    g = g / jnp.sum(g, axis=1, keepdims=True)
    b = b / jnp.sum(b, axis=1, keepdims=True)
    result = g * (jnp.log(EPS + s) - jnp.log(EPS + b))
    return jnp.mean(jnp.sum(result, axis=1))


# --- host-side AUCs (offline eval; reference computes these outside the
# --- training loop too) ---


def auc_judd(saliency_map: np.ndarray, fixation_map: np.ndarray, jitter: bool = True,
             rng: np.random.Generator | None = None) -> float:
    """AUC-Judd: threshold sweep at each fixated saliency value."""
    saliency_map = np.asarray(saliency_map, dtype=np.float64)
    fixation_map = np.asarray(fixation_map)
    if saliency_map.ndim == 3:
        saliency_map = saliency_map[0]
        fixation_map = fixation_map[0]
    if not fixation_map.any():
        return float("nan")
    if saliency_map.shape != fixation_map.shape:
        import cv2

        saliency_map = cv2.resize(saliency_map, (fixation_map.shape[1], fixation_map.shape[0]))
    if jitter:
        rng = rng or np.random.default_rng()
        saliency_map = saliency_map + rng.random(saliency_map.shape) / 1e7
    saliency_map = (saliency_map - saliency_map.min()) / (saliency_map.max() - saliency_map.min())

    s = saliency_map.ravel()
    f = fixation_map.ravel()
    sth = np.sort(s[f > 0])[::-1]
    n_fix = len(sth)
    n_pix = len(s)

    # vectorised sweep: for the i-th highest fixated value, count sal values
    # >= that threshold across the whole map
    order = np.sort(s)
    above = n_pix - np.searchsorted(order, sth, side="left")
    tp = np.concatenate([[0.0], (np.arange(n_fix) + 1) / n_fix, [1.0]])
    fp = np.concatenate([[0.0], (above - np.arange(n_fix)) / (n_pix - n_fix), [1.0]])
    return float(np.trapezoid(tp, x=fp))


def auc_shuff(s_map: np.ndarray, gt: np.ndarray, other_map: np.ndarray,
              splits: int = 100, rng: np.random.Generator | None = None) -> float:
    """Shuffled AUC with negatives sampled from fixations of other images."""
    rng = rng or np.random.default_rng()
    s_map = np.asarray(s_map, dtype=np.float64)
    if s_map.ndim == 3:
        s_map, gt, other_map = s_map[0], gt[0], other_map[0]
    s_map = (s_map - s_map.min()) / (s_map.max() - s_map.min())
    gt = np.asarray(gt)
    other_map = np.asarray(other_map)

    num_fixations = np.sum(gt)
    x, y = np.where(other_map == 1)
    other_fixs = x * other_map.shape[0] + y
    ind = len(other_fixs)

    thresholds = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    aucs = []
    for _ in range(splits):
        perm = rng.permutation(ind)
        flat_idx = other_fixs[perm]
        r_sal = s_map[flat_idx % s_map.shape[0] - 1, (flat_idx / s_map.shape[0]).astype(int)]
        area = [(0.0, 0.0)]
        for thresh in thresholds:
            temp = (s_map >= thresh).astype(np.float64)
            num_overlap = np.sum((temp + gt) == 2)
            tp = num_overlap / (num_fixations * 1.0)
            fp = np.sum(r_sal > thresh) / (num_fixations * 1.0)
            area.append((round(tp, 4), round(fp, 4)))
        area.append((1.0, 1.0))
        area.sort(key=lambda t: t[0])
        tp_list = np.array([a[0] for a in area])
        fp_list = np.array([a[1] for a in area])
        aucs.append(np.trapezoid(tp_list, fp_list))
    return float(np.mean(aucs))
