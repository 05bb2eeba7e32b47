"""Grad-CAM visualization CLI for zoo classifiers.

Reference: SlowFast/slowfast/visualization/gradcam_utils.py driven through
tensorboard_vis.py — Grad-CAM heatmaps of a video classifier's decisions.

  python tools/visualize.py --model x3dl --frames <frame_dir> --out ./cams
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="x3dl",
                   choices=["slowfast4x16", "x3dl", "mvitv2s"])
    p.add_argument("--frames", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_frames", default=16, type=int)
    p.add_argument("--crop_size", default=224, type=int)
    p.add_argument("--tap", default=-1, type=int,
                   help="pyramid level for the CAM (default: last)")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from mspi_tpu.data.video import normalize_frames
    from mspi_tpu.models.video_zoo import build_classifier
    from mspi_tpu.utils.cache import enable_compilation_cache
    from mspi_tpu.utils.visualization import grad_cam
    from PIL import Image

    enable_compilation_cache()
    model = build_classifier(args.model)
    files = sorted(os.listdir(args.frames))[: args.num_frames]
    frames = np.stack([
        np.asarray(Image.open(os.path.join(args.frames, f)).convert("RGB")
                   .resize((args.crop_size, args.crop_size)), dtype=np.uint8)
        for f in files])
    clips = jnp.asarray(normalize_frames(frames))[None]

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), clips)

    def backbone_apply(c):
        return model.apply(variables, c, method=lambda m, c: m.backbone(c))

    def head_apply(feats):
        return model.apply(variables, feats,
                           method=lambda m, f: m.head([f[-1]] if args.model != "mvitv2s" else f[-1]))

    cams, scores = grad_cam(backbone_apply, head_apply, clips, tap=args.tap)
    cams = np.asarray(cams)[0]  # [T,H,W]
    os.makedirs(args.out, exist_ok=True)
    for t in range(cams.shape[0]):
        cam = cv2.resize(cams[t], (args.crop_size, args.crop_size))
        heat = cv2.applyColorMap((cam * 255).astype(np.uint8), cv2.COLORMAP_JET)
        src_t = min(int(t * len(frames) / cams.shape[0]), len(frames) - 1)
        frame = cv2.cvtColor(frames[src_t], cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(args.out, f"cam_{t:03d}.png"),
                    cv2.addWeighted(frame, 0.5, heat, 0.5, 0))
    print(f"predicted class {int(np.argmax(np.asarray(scores)[0]))}; "
          f"wrote {cams.shape[0]} CAM frames to {args.out}")


if __name__ == "__main__":
    main()
