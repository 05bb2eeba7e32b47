"""ROI-align head + AVA mAP evaluation."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mspi_tpu.models.roi_head import ResNetRoIHead, roi_align
from mspi_tpu.utils.ava_eval import AVAMeter, average_precision, box_iou


def test_roi_align_vs_torchvision_free_reference(rng):
    """Compare against a dense bilinear crop-resize reference for an
    axis-aligned box on a smooth feature map."""
    H, W, C = 16, 16, 4
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    fmap = np.stack([yy, xx, yy + xx, yy * 0 + 1], -1).astype(np.float32)
    box = np.array([[2.0, 3.0, 10.0, 11.0]], np.float32)
    out = np.array(roi_align(jnp.asarray(fmap), jnp.asarray(box), 4,
                             spatial_scale=1.0))
    assert out.shape == (1, 4, 4, 4)
    # constant channel stays constant; linear channels average to bin centres
    np.testing.assert_allclose(out[0, ..., 3], 1.0, atol=1e-5)
    bin_h = (11.0 - 3.0) / 4
    expected_y0 = 3.0 + bin_h / 2  # first bin centre in y
    np.testing.assert_allclose(out[0, 0, 0, 0], expected_y0, atol=0.2)


def test_roi_head_shapes(rng):
    head = ResNetRoIHead(dim_in=8, num_classes=5, pool_size=3,
                         spatial_scale=1.0, dropout_rate=0.0)
    feats = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 8)).astype(np.float32))
    boxes = jnp.asarray(np.array([[0, 0, 4, 4], [2, 2, 7, 7], [1, 1, 6, 6]],
                                 np.float32))
    idx = jnp.asarray(np.array([0, 0, 1]))
    v = head.init(jax.random.PRNGKey(0), feats, boxes, idx)
    out = head.apply(v, feats, boxes, idx)
    assert out.shape == (3, 5)
    assert np.all((np.array(out) >= 0) & (np.array(out) <= 1))  # sigmoid


def test_box_iou():
    a = np.array([[0, 0, 2, 2]], np.float32)
    b = np.array([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]], np.float32)
    iou = box_iou(a, b)[0]
    np.testing.assert_allclose(iou, [1 / 7, 1.0, 0.0], atol=1e-6)


def test_average_precision_perfect_and_random():
    scores = np.array([0.9, 0.8, 0.7])
    ap = average_precision(scores, np.array([1, 1, 1]), num_gt=3)
    assert abs(ap - 1.0) < 1e-6
    ap0 = average_precision(scores, np.array([0, 0, 0]), num_gt=3)
    assert ap0 == 0.0


def test_ava_meter_map():
    m = AVAMeter(num_classes=3)
    m.update_groundtruth("img0", np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
                         np.array([0, 1]))
    # predictions: perfect box for class 0, bad box for class 1
    scores = np.zeros((2, 3), np.float32)
    scores[0, 0] = 0.9
    scores[1, 1] = 0.8
    m.update_predictions("img0",
                         np.array([[0, 0, 10, 10], [50, 50, 60, 60]]),
                         scores)
    stats = m.finalize_metrics()
    assert stats["num_classes_evaluated"] == 2
    # class 0 AP high (but the class-1-scored box also scores ~0 on class 0)
    assert 0.4 < stats["mAP"] <= 1.0
