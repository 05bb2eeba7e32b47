"""Model visualization: Grad-CAM, weight/activation introspection, scalar
logging.

Reference: SlowFast/slowfast/visualization/gradcam_utils.py:12-178 (GradCAM
on a target layer), visualization/utils.py:158-… (weight/activation
statistics), and tensorboard_vis.py:20-429 (scalar/histogram writer).

JAX-native Grad-CAM: the zoo classifiers already split into backbone
features + head, so the CAM weights are one jax.grad of the class score
w.r.t. the tapped feature map — no hooks needed.

Scalars are written as JSONL (and optionally TensorBoard event files when a
writer backend is importable); histograms/weight stats are computed with
numpy.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def grad_cam(backbone_apply: Callable, head_apply: Callable, clips: jnp.ndarray,
             class_idx: Optional[jnp.ndarray] = None, tap: int = -1):
    """Grad-CAM heatmaps for a video classifier.

    backbone_apply(clips) -> list of [B,T,H,W,C] feature maps;
    head_apply(feats) -> [B, num_classes] scores.
    Returns [B,T,H,W] maps min-max normalised per sample
    (gradcam_utils.py:66-131 semantics: ReLU(sum_c w_c * A_c)).
    """
    feats = backbone_apply(clips)
    target = feats[tap]

    def score_fn(f):
        fs = list(feats)
        fs[tap] = f
        scores = head_apply(fs)
        if class_idx is None:
            idx = jnp.argmax(scores, axis=-1)
        else:
            idx = class_idx
        return jnp.sum(jnp.take_along_axis(scores, idx[:, None], axis=-1)), scores

    grads, scores = jax.grad(score_fn, has_aux=True)(target)
    weights = jnp.mean(grads, axis=(1, 2, 3), keepdims=True)  # GAP over T,H,W
    cam = jax.nn.relu(jnp.sum(weights * target, axis=-1))  # [B,T,H,W]
    flat = cam.reshape(cam.shape[0], -1)
    mn = flat.min(axis=1)[:, None, None, None]
    mx = flat.max(axis=1)[:, None, None, None]
    return (cam - mn) / jnp.maximum(mx - mn, 1e-12), scores


def weight_stats(params) -> Dict[str, Dict[str, float]]:
    """Per-leaf weight statistics (visualization/utils.py get_layer stats)."""
    out = {}

    def visit(path, leaf):
        arr = np.asarray(leaf)
        out["/".join(str(getattr(k, "key", k)) for k in path)] = {
            "shape": list(arr.shape),
            "mean": float(arr.mean()),
            "std": float(arr.std()),
            "min": float(arr.min()),
            "max": float(arr.max()),
        }

    jax.tree_util.tree_map_with_path(visit, params)
    return out


def activation_stats(model, variables, *args, filter_fn=None, **kwargs):
    """Capture intermediate activations and summarise them
    (capture_intermediates — the torch forward-hook equivalent)."""
    _, state = model.apply(variables, *args, capture_intermediates=True, **kwargs)
    inter = state["intermediates"]
    out = {}

    def visit(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if filter_fn and not filter_fn(name):
            return
        arr = np.asarray(leaf)
        out[name] = {"shape": list(arr.shape), "mean": float(arr.mean()),
                     "std": float(arr.std())}

    jax.tree_util.tree_map_with_path(visit, inter)
    return out


class ScalarWriter:
    """JSONL scalar writer with TensorBoard-compatible layout
    (tensorboard_vis.py add_scalars semantics)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "scalars.jsonl")

    def add_scalars(self, scalars: Dict[str, float], global_step: int):
        with open(self.path, "a") as f:
            f.write(json.dumps({"step": global_step, "time": time.time(),
                                **{k: float(v) for k, v in scalars.items()}}) + "\n")

    def add_histogram(self, name: str, values, global_step: int, bins: int = 32):
        hist, edges = np.histogram(np.asarray(values).ravel(), bins=bins)
        with open(os.path.join(self.log_dir, "histograms.jsonl"), "a") as f:
            f.write(json.dumps({"step": global_step, "name": name,
                                "hist": hist.tolist(),
                                "edges": edges.tolist()}) + "\n")

    def plot_confusion_matrix(self, preds: np.ndarray, labels: np.ndarray,
                              num_classes: int, global_step: int):
        cm = np.zeros((num_classes, num_classes), dtype=np.int64)
        for p, l in zip(preds, labels):
            cm[int(l), int(p)] += 1
        np.save(os.path.join(self.log_dir, f"confusion_{global_step}.npy"), cm)
        # rendered figure alongside the raw matrix (reference
        # tensorboard_vis.py:165-230 draws the matplotlib figure)
        try:
            import cv2

            from mspi_tpu.utils.tensorboard import _render_confusion_matrix

            img = _render_confusion_matrix(cm)
            cv2.imwrite(os.path.join(self.log_dir,
                                     f"confusion_{global_step}.png"),
                        img[:, :, ::-1])
        except ImportError:
            pass
        return cm

    def close(self):
        pass


class VideoVisualizer:
    """Prediction / AVA-box overlay renderer (reference
    SlowFast/slowfast/visualization/video_visualizer.py:349-641).

    PIL-based (no matplotlib dependency): per-class colors come from an HSV
    wheel, predictions are picked by "top-k" or "thres" mode, and boxes are
    drawn with their class labels on uint8 RGB frames.
    """

    def __init__(self, num_classes: int, class_names=None, top_k: int = 1,
                 thres: float = 0.7, mode: str = "top-k"):
        assert mode in ("top-k", "thres"), mode
        self.num_classes = num_classes
        if isinstance(class_names, str):  # json {classname: id}
            import json

            with open(class_names) as f:
                mapping = json.load(f)
            class_names = [None] * num_classes
            for name, i in mapping.items():
                if 0 <= int(i) < num_classes:
                    class_names[int(i)] = name
        self.class_names = class_names or [str(i) for i in range(num_classes)]
        self.top_k = top_k
        self.thres = thres
        self.mode = mode

    def _color(self, class_id: int):
        import colorsys

        r, g, b = colorsys.hsv_to_rgb(class_id / max(self.num_classes, 1), 0.9, 1.0)
        return int(r * 255), int(g * 255), int(b * 255)

    def _pick(self, scores: np.ndarray):
        scores = np.asarray(scores)
        if self.mode == "top-k":
            ids = np.argsort(-scores)[: self.top_k]
        else:
            ids = np.nonzero(scores >= self.thres)[0]
        return [(int(i), float(scores[i])) for i in ids]

    def draw_one_frame(self, frame: np.ndarray, preds: np.ndarray,
                       bboxes=None) -> np.ndarray:
        """frame: [H,W,3] uint8; preds: [num_boxes, C] (or [C] clip-level);
        bboxes: [num_boxes, 4] (x1,y1,x2,y2) or None."""
        from PIL import Image, ImageDraw

        img = Image.fromarray(np.asarray(frame).astype(np.uint8))
        draw = ImageDraw.Draw(img)
        preds = np.atleast_2d(np.asarray(preds))
        if bboxes is None:
            y = 2
            for cid, score in self._pick(preds[0]):
                draw.text((2, y), f"{self.class_names[cid]}: {score:.2f}",
                          fill=self._color(cid))
                y += 11
        else:
            for box, sc in zip(np.asarray(bboxes), preds):
                picks = self._pick(sc)
                color = self._color(picks[0][0]) if picks else (255, 255, 255)
                draw.rectangle([float(box[0]), float(box[1]),
                                float(box[2]), float(box[3])],
                               outline=color, width=2)
                y = float(box[1]) + 2
                for cid, score in picks:
                    draw.text((float(box[0]) + 2, y),
                              f"{self.class_names[cid]}: {score:.2f}",
                              fill=self._color(cid))
                    y += 11
        return np.asarray(img)

    def draw_clip(self, frames: np.ndarray, preds: np.ndarray, bboxes=None,
                  keyframe_idx=None) -> np.ndarray:
        """frames: [T,H,W,3] uint8 -> same, annotated.  Boxes are drawn on
        every frame (the reference repeats the keyframe detections across
        the clip); text only on the keyframe if given."""
        out = []
        for t, frame in enumerate(np.asarray(frames)):
            if bboxes is not None:
                out.append(self.draw_one_frame(frame, preds, bboxes))
            elif keyframe_idx is None or t == keyframe_idx:
                out.append(self.draw_one_frame(frame, preds))
            else:
                out.append(np.asarray(frame).astype(np.uint8))
        return np.stack(out)
