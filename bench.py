"""Benchmark: audio-visual saliency inference throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": R}

Measures the flagship AudioVisualSaliencyModel (16x224x384 clips + audio
spectrogram, the exact inference.py workload) as a jitted batched forward on
the real chip.  vs_baseline is the ratio to the reference PyTorch model's
throughput on this image's CPU (BENCH_BASELINE.json, measured by
tools/bench_torch_baseline.py; the reference repo itself publishes no AVSP
throughput numbers — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mspi_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mspi_tpu.config import get_config
    from mspi_tpu.data.video import normalize_clip_jax
    from mspi_tpu.models.fusion import AudioVisualSaliencyModel

    # Default = the flagship: the reference's default motion encoder is
    # mvitv2s (reference config.py:59); bf16 is the TPU-native inference
    # dtype (numerics validated in tests/test_bf16_mode.py).
    backbone = os.environ.get("MSPI_BENCH_BACKBONE", "mvitv2s")
    batch = int(os.environ.get("MSPI_BENCH_BATCH", "8"))
    dtype = os.environ.get("MSPI_BENCH_DTYPE", "bfloat16")
    if dtype == "bfloat16":
        from mspi_tpu.ops.layers import set_default_compute_dtype

        set_default_compute_dtype(jnp.bfloat16)
    res_env = os.environ.get("MSPI_BENCH_RES")  # e.g. "224,224" for morphmlps
    overrides = {}
    if res_env:
        overrides = {"data": {"resolution": tuple(int(x) for x in res_env.split(","))}}
    cfg = get_config(backbone, overrides=overrides)
    model = AudioVisualSaliencyModel(cfg=cfg)
    h, w = cfg.data.resolution

    rng = np.random.default_rng(0)
    clips_u8 = jnp.asarray(rng.integers(0, 256, (batch, 16, h, w, 3), dtype=np.uint8))
    audio = jnp.asarray(rng.standard_normal((batch, 257, 111, 1)).astype(np.float32))

    # zeros-init via eval_shape: throughput does not depend on weight values,
    # and skipping the giant init program halves compile work
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                               normalize_clip_jax(clips_u8[:1]),
                                               audio[:1]))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    # N forwards chained inside one program: timing that is robust to the
    # host<->device transport's async readiness ACKs (a plain dispatch loop
    # can both under- and over-report; see ROUND1_NOTES.md).
    compute_dt = jnp.bfloat16 if dtype == "bfloat16" else None

    @jax.jit
    def run_n(variables, clips_u8, audio, n):
        def body(_, carry):
            c, acc = carry
            # raw uint8 in: the stems fold the ImageNet affine into their
            # weights (ops/layers.py _fold_uint8_affine), so no normalized
            # clip is ever materialized
            out, _ = model.apply(variables, c, audio, train=False)
            s = jnp.sum(out)
            # data-dependent but runtime-zero feedback defeats loop-invariant
            # hoisting while keeping the carry uint8 (a float carry forces a
            # 4x-wider convert copy every iteration)
            return (c + (s * 1e-30 > 1.0).astype(c.dtype), acc + s)

        _, acc = jax.lax.fori_loop(0, n, body, (clips_u8, jnp.float32(0)))
        return acc

    iters = int(os.environ.get("MSPI_BENCH_ITERS", "20"))
    # Repeat-median protocol (VERDICT r3 item 6): session/tunnel state moves
    # single measurements by up to +-10%, so one number per round hid error
    # bars larger than most round-over-round deltas.  Each repeat is an
    # independent chained-iteration block minus a 1-iteration run; the
    # headline is the median, and the JSON carries the spread.
    repeats = int(os.environ.get("MSPI_BENCH_REPEATS", "3"))
    float(run_n(variables, clips_u8, audio, 1))  # compile + warmup (D2H sync)
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_n(variables, clips_u8, audio, iters + 1))
        dt_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_n(variables, clips_u8, audio, 1))
        dt_1 = time.perf_counter() - t0
        samples.append(batch * iters / max(dt_n - dt_1, 1e-9))
    clips_per_sec = float(np.median(samples))

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_BASELINE.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)["torch_cpu_clips_per_sec"]
        vs = clips_per_sec / base

    # FLOPs / MFU: XLA's own cost analysis of the single-forward program,
    # against the chip's MXU peak (TPU v5e: 197 TFLOP/s bf16).  The analysis
    # runs with Pallas disabled: custom kernels are invisible to XLA's FLOP
    # counter, and the jnp path computes the same math.
    flops_per_clip = mfu = None
    try:
        from mspi_tpu.utils.profiling import cost_analysis

        def fwd(variables, clips_u8, audio):
            os.environ["MSPI_DISABLE_PALLAS"] = "1"
            try:
                out, _ = model.apply(variables, normalize_clip_jax(clips_u8),
                                     audio, train=False)
            finally:
                os.environ.pop("MSPI_DISABLE_PALLAS", None)
            return out

        flops = cost_analysis(fwd, variables, clips_u8, audio).get("flops", 0.0)
        if flops:
            flops_per_clip = flops / batch
            kind = jax.devices()[0].device_kind.lower()
            peak = 197e12 if "v5" in kind else 275e12 if "v6" in kind else None
            if peak:
                mfu = clips_per_sec * flops_per_clip / peak
    except Exception:
        pass

    print(json.dumps({
        "metric": f"AVSP inference clips/sec/chip ({backbone}, 16x{h}x{w}, "
                  f"batch {batch}, {dtype})",
        "value": round(clips_per_sec, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        "gflops_per_clip": round(flops_per_clip / 1e9, 1) if flops_per_clip else None,
        "mfu_vs_bf16_peak": round(mfu, 4) if mfu else None,
        "spread": {"repeats": repeats,
                   "min": round(min(samples), 3),
                   "max": round(max(samples), 3)},
    }))


if __name__ == "__main__":
    main()
