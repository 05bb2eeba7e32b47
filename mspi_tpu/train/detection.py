"""AVA action-detection engine: detector model + train/eval steps + the
mAP evaluation loop.

Reference: SlowFast/slowfast/models/video_model_builder.py (DETECTION.ENABLE
branch builds the trunk + head_helper.ResNetRoIHead), tools/train_net.py:100-
168 (detection branch of train_epoch: BCE loss on sigmoid box scores, AVAMeter
updates with boxes/ori_boxes/metadata), slowfast/utils/meters.py:46-246
(AVAMeter) and ava_eval_helper.py (frame-mAP evaluation).

TPU-native: the step is one jitted program over padded static-shape boxes
(box_mask selects real boxes inside the loss), so no recompiles across
batches with different box counts.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn, struct

from mspi_tpu.utils.ava_eval import AVAMeter


class VideoDetector(nn.Module):
    """Feature trunk + ROI head (video_model_builder.py DETECTION branch).

    trunk: any pyramid backbone from mspi_tpu.models.registry (the ROI head
    consumes the stride-16 v3 tap by default, mirroring the reference's
    res5-with-dilation stride-16 detection trunks)."""

    trunk: nn.Module
    dim_in: int
    num_classes: int = 80
    tap: int = 2                   # pyramid index (v3 = stride 16)
    spatial_scale: float = 1.0 / 16
    pool_size: int = 7
    dropout_rate: float = 0.5

    def setup(self):
        from mspi_tpu.models.roi_head import ResNetRoIHead

        self.head = ResNetRoIHead(
            dim_in=self.dim_in, num_classes=self.num_classes,
            pool_size=self.pool_size, spatial_scale=self.spatial_scale,
            dropout_rate=self.dropout_rate)

    def __call__(self, clips, boxes, box_batch_idx, train: bool = False,
                 rng=None):
        feats = self.trunk(clips, train=train)
        return self.head(feats[self.tap], boxes, box_batch_idx, train=train,
                         rng=rng)


class DetTrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: Any


def create_det_state(model, tx, sample_batch, seed: int = 0) -> DetTrainState:
    B, max_boxes = sample_batch["boxes"].shape[:2]
    flat_boxes, idx = _flatten_boxes(sample_batch["boxes"])
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed),
                                    sample_batch["clips"], flat_boxes, idx)
    return DetTrainState(params=variables["params"],
                         batch_stats=variables.get("batch_stats", {}),
                         opt_state=tx.init(variables["params"]),
                         rng=jax.random.PRNGKey(seed))


def _flatten_boxes(boxes: jnp.ndarray):
    """[B, max_boxes, 4] -> ([B*max_boxes, 4], [B*max_boxes] batch idx)."""
    B, M = boxes.shape[:2]
    idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), M)
    return boxes.reshape(B * M, 4), idx


def masked_bce(probs, labels, mask, eps: float = 1e-7):
    """Mean BCE over real boxes only (train_net.py detection loss is
    nn.BCELoss on sigmoid outputs)."""
    probs = jnp.clip(probs, eps, 1 - eps)
    per_box = -(labels * jnp.log(probs) + (1 - labels) * jnp.log(1 - probs))
    per_box = per_box.mean(axis=-1)
    mask = mask.astype(per_box.dtype)
    return jnp.sum(per_box * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_det_train_step(model, tx, jit: bool = True):
    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        flat_boxes, idx = _flatten_boxes(batch["boxes"])
        probs, updates = model.apply(
            variables, batch["clips"], flat_boxes, idx, train=True, rng=rng,
            mutable=["batch_stats"])
        labels = batch["labels"].reshape(probs.shape[0], -1)
        mask = batch["box_mask"].reshape(-1)
        loss = masked_bce(probs, labels.astype(probs.dtype), mask)
        return loss, updates["batch_stats"]

    def train_step(state: DetTrainState, batch, lr):
        rng, step_rng = jax.random.split(state.rng)
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, step_rng)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, batch_stats=new_bs,
                             opt_state=opt_state, rng=rng), loss

    return jax.jit(train_step, donate_argnums=(0,)) if jit else train_step


def make_det_eval_step(model):
    def eval_step(state: DetTrainState, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        flat_boxes, idx = _flatten_boxes(batch["boxes"])
        return model.apply(variables, batch["clips"], flat_boxes, idx,
                           train=False)

    return jax.jit(eval_step)


def run_ava_eval(state, eval_step, batches, num_classes: int = 80,
                 iou_threshold: float = 0.5,
                 log: Optional[Callable[[str], None]] = None) -> Dict[str, float]:
    """Detection eval loop (train_net.py eval_epoch detection branch +
    AVAMeter.finalize_metrics): run the jitted eval step per batch, key
    predictions/GT by (video_idx, sec), report frame mAP."""
    meter = AVAMeter(num_classes=num_classes, iou_threshold=iou_threshold)
    for batch in batches:
        probs = np.asarray(eval_step(state, batch))
        B, M = batch["boxes"].shape[:2]
        probs = probs.reshape(B, M, -1)
        for b in range(B):
            mask = np.asarray(batch["box_mask"][b])
            if not mask.any():
                continue
            vid, sec = np.asarray(batch["metadata"][b])[mask.argmax()]
            image_id = f"{int(vid)},{int(sec):04d}"
            boxes = np.asarray(batch["ori_boxes"][b])[mask]
            meter.update_predictions(image_id, boxes, probs[b][mask])
            labels = np.asarray(batch["labels"][b])[mask]
            # multi-hot -> per-class GT rows (a box with k labels counts as
            # k single-class ground truths, matching the official evaluator)
            gt_boxes, gt_labels = [], []
            for box, lab in zip(boxes, labels):
                for cls in np.nonzero(lab)[0]:
                    gt_boxes.append(box)
                    gt_labels.append(cls)
            if gt_boxes:
                meter.update_groundtruth(image_id, np.stack(gt_boxes),
                                         np.asarray(gt_labels))
    stats = meter.finalize_metrics()
    if log:
        log(f"AVA eval: mAP={stats['mAP']:.4f} over "
            f"{stats['num_classes_evaluated']} classes")
    return stats
