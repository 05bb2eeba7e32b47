"""Saliency demo over a frame directory (webcam/video demo capability).

Reference: SlowFast/tools/demo_net.py:21-96 + visualization/demo_loader.py —
the async read->predict->write demo pipeline.  Sources are frame
directories (no ffmpeg in this image); predictions are written as heatmap
PNGs (optionally alpha-blended onto the frames).

  python tools/demo_net.py --frames ./video_frames/AVAD/v1 --out ./demo_out \
      [--weight ckpt --motion_encoder s3d --blend]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", required=True, help="directory of JPEG frames")
    p.add_argument("--out", required=True)
    p.add_argument("--weight", default="")
    p.add_argument("--motion_encoder", default="s3d")
    p.add_argument("--clip_size", default=16, type=int)
    p.add_argument("--stride", default=1, type=int)
    p.add_argument("--batch", default=4, type=int)
    p.add_argument("--blend", action="store_true",
                   help="overlay the heatmap on the frame")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from mspi_tpu.config import get_config
    from mspi_tpu.data.video import normalize_clip_jax
    from mspi_tpu.models.fusion import AudioVisualSaliencyModel
    from mspi_tpu.utils.cache import enable_compilation_cache
    from mspi_tpu.utils.demo import AsyncDemo, FrameDirSource

    enable_compilation_cache()
    cfg = get_config(args.motion_encoder)
    h, w = cfg.data.resolution
    model = AudioVisualSaliencyModel(cfg=cfg)
    sample_clips = jnp.zeros((1, args.clip_size, h, w, 3), jnp.float32)
    sample_audio = jnp.full((1, *cfg.data.spectro_shape, 1), 0.02, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample_clips, sample_audio)
    variables = jax.tree.map(np.asarray, variables)
    if args.weight:
        from mspi_tpu.convert import (convert_state_dict, load_torch_checkpoint,
                                      merge_converted)

        conv = convert_state_dict(load_torch_checkpoint(args.weight))
        variables = {c: merge_converted(variables[c], conv.get(c, {}), strict=False)
                     for c in variables}

    silent_audio = jnp.full((args.batch, *cfg.data.spectro_shape, 1), 0.02,
                            jnp.float32)

    @jax.jit
    def predict(variables, clips_u8):
        out, _ = model.apply(variables, normalize_clip_jax(clips_u8),
                             silent_audio[: clips_u8.shape[0]], train=False)
        return out

    source = FrameDirSource(args.frames, args.clip_size, (h, w), args.stride)
    os.makedirs(args.out, exist_ok=True)

    def write_fn(idx, pred):
        sal = np.exp(pred)
        sal = (sal - sal.min()) / max(sal.max() - sal.min(), 1e-12)
        heat = cv2.applyColorMap((sal * 255).astype(np.uint8), cv2.COLORMAP_JET)
        if args.blend:
            frame = cv2.cvtColor(source.frames[idx], cv2.COLOR_RGB2BGR)
            heat = cv2.addWeighted(frame, 0.5, heat, 0.5, 0)
        cv2.imwrite(os.path.join(args.out, f"sal_{idx:05d}.png"), heat)

    demo = AsyncDemo(lambda clips: predict(variables, jnp.asarray(clips)),
                     write_fn, batch_size=args.batch)
    demo.run(iter(source))
    print(f"wrote demo frames to {args.out}")


if __name__ == "__main__":
    main()
