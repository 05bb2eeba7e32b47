"""Component-level throughput breakdown of the AVSP fusion model.

Times each stage of the flagship forward separately (chained-iteration
programs, same discipline as bench.py): video backbone, ConvNeXt image
prior, audio encoder, and the fusion remainder (SyncBlock + decoder +
readout), so the optimisation target is measured, not guessed.

  python tools/bench_components.py [--backbone mvitv2s --batch 8
      --dtype bfloat16 --iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed_loop(fn, args, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(n, x, *rest):
        # feedback into the input defeats loop-invariant hoisting (bench.py)
        def body(_, carry):
            xc, acc = carry
            s = jnp.sum(fn(xc, *rest)).astype(jnp.float32)
            return (xc + (s * 1e-30).astype(xc.dtype), acc + s)

        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    float(run_n(1, *args))
    t0 = time.perf_counter()
    float(run_n(iters + 1, *args))
    dt_n = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run_n(1, *args))
    dt_1 = time.perf_counter() - t0
    return (dt_n - dt_1) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="mvitv2s")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mspi_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.dtype == "bfloat16":
        from mspi_tpu.ops.layers import set_default_compute_dtype

        set_default_compute_dtype(jnp.bfloat16)

    from mspi_tpu.config import get_config
    from mspi_tpu.models.audio_resnet import AudioResNet18
    from mspi_tpu.models.convnext import ConvNeXtTinyFeatures
    from mspi_tpu.models.fusion import AudioVisualSaliencyModel
    from mspi_tpu.models.registry import build_backbone

    cfg = get_config(args.backbone)
    h, w = cfg.data.resolution
    B, T = args.batch, cfg.data.num_frames
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.standard_normal((B, T, h, w, 3)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((B, *cfg.data.spectro_shape, 1))
                        .astype(np.float32))

    results = {}

    # full model
    full = AudioVisualSaliencyModel(cfg=cfg)
    v_full = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                          jax.eval_shape(lambda: full.init(
                              jax.random.PRNGKey(0), clips, audio)))
    results["full_model"] = timed_loop(
        lambda c, a: full.apply(v_full, c, a, train=False)[0], (clips, audio),
        args.iters)

    # video backbone
    bb = build_backbone(cfg)
    v_bb = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                        jax.eval_shape(lambda: bb.init(jax.random.PRNGKey(0), clips)))
    results["video_backbone"] = timed_loop(
        lambda c: bb.apply(v_bb, c, train=False)[-1], (clips,), args.iters)

    # image prior: ConvNeXt over B*T frames
    frames = clips.reshape(B * T, h, w, 3)
    prior = ConvNeXtTinyFeatures()
    v_p = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                       jax.eval_shape(lambda: prior.init(jax.random.PRNGKey(0), frames)))
    results["image_prior"] = timed_loop(
        lambda f: prior.apply(v_p, f)[-1], (frames,), args.iters)

    # audio encoder
    aud = AudioResNet18()
    v_a = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                       jax.eval_shape(lambda: aud.init(jax.random.PRNGKey(0), audio)))
    results["audio_encoder"] = timed_loop(
        lambda a: aud.apply(v_a, a, train=False), (audio,), args.iters)

    rest = results["full_model"] - results["video_backbone"] \
        - results["image_prior"] - results["audio_encoder"]
    out = {k: round(v * 1000, 2) for k, v in results.items()}
    out["fusion_rest_ms"] = round(rest * 1000, 2)
    out["unit"] = "ms/iter"
    out["batch"] = B
    out["dtype"] = args.dtype
    out["clips_per_sec_full"] = round(B / results["full_model"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
