"""Int8 MXU lab: is the v5e int8 path (2x bf16 peak on paper) reachable
from Pallas, and does it survive dynamic activation quantization?

Measures, at a square GEMM and at the fused-MLP shapes:

  gemm_bf16 / gemm_int8   raw pallas matmul rate, operands pre-cast
  mlp_bf16                two-matmul MLP kernel (the bench_lnmlp floor)
  mlp_int8w               int8 weights + per-row-tile dynamic activation
                          quant in-kernel (abs-max -> int8), int32 accum,
                          fp32 dequant between the matmuls — the shape an
                          int8 inference mode would actually run
  xla_int8                jnp dot_general int8xint8->int32 outside Pallas

Usage: python tools/bench_int8.py [variant ...]
Env: MSPI_LAB_SHAPE=B,N,C,H  MSPI_LAB_ITERS=50  MSPI_LAB_GEMM=4096
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mspi_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

SHAPE = tuple(int(x) for x in os.environ.get(
    "MSPI_LAB_SHAPE", "128,5376,96,384").split(","))
ITERS = int(os.environ.get("MSPI_LAB_ITERS", "50"))
# 1024: whole GEMM fits VMEM single-step (bf16 a+b+o = 6 MB)
GEMM = int(os.environ.get("MSPI_LAB_GEMM", "1024"))


# ---- raw GEMM rate ----

def _gemm_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32 if a_ref.dtype == jnp.int8
        else jnp.float32).astype(o_ref.dtype)


def _gemm(a, b, out_dtype):
    M, K = a.shape
    _, Nn = b.shape
    spec = lambda s: pl.BlockSpec(s, lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _gemm_kernel,
        in_specs=[spec((M, K)), spec((K, Nn))],
        out_specs=spec((M, Nn)),
        out_shape=jax.ShapeDtypeStruct((M, Nn), out_dtype),
    )(a, b)


# ---- MLP kernels ----

def _mlp_bf16_kernel(x_ref, w1_ref, w2_ref, o_ref):
    x = x_ref[0]
    u = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = u.astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _quant_rows(xf):
    """Per-row abs-max symmetric int8 quantization; returns (q, scale)."""
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    q = jnp.round(xf / scale).astype(jnp.int8)
    return q, scale


def _mlp_int8w_kernel(x_ref, w1_ref, s1_ref, w2_ref, s2_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)
    q, sx = _quant_rows(x)
    u = jax.lax.dot_general(
        q, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    uf = u.astype(jnp.float32) * sx * s1_ref[0]
    qh, sh = _quant_rows(uf)
    y = jax.lax.dot_general(
        qh, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    yf = y.astype(jnp.float32) * sh * s2_ref[0]
    o_ref[0] = yf.astype(o_ref.dtype)


def _mlp_call(kernel, x, ws, tr):
    B, N, C = x.shape
    x_spec = pl.BlockSpec((1, tr, C), lambda b, t: (b, t, 0),
                          memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(w.shape, lambda b, t: tuple(0 for _ in w.shape),
                            memory_space=pltpu.VMEM) for w in ws]
    return pl.pallas_call(
        kernel,
        grid=(B, N // tr),
        in_specs=[x_spec] + w_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
    )(x, *ws)


def main():
    B, N, C, H = SHAPE
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def bench(fn, x, flops):
        @jax.jit
        def run_n(x, n):
            def body(_, c):
                y = fn(c)
                if jnp.issubdtype(c.dtype, jnp.integer):
                    # data-dependent, non-foldable carry for int pipelines
                    return c + (y.astype(jnp.int32) >> 31).astype(c.dtype)
                return c + y.astype(c.dtype) * c.dtype.type(1e-24)
            return jax.lax.fori_loop(0, n, body, x)

        run_n(x, 1).block_until_ready()
        t0 = time.perf_counter()
        run_n(x, ITERS + 1).block_until_ready()
        dt_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_n(x, 1).block_until_ready()
        dt_1 = time.perf_counter() - t0
        ms = (dt_n - dt_1) / ITERS * 1e3
        return ms, flops / (ms * 1e-3) / 1e12

    names = sys.argv[1:] or ["gemm_bf16", "gemm_int8", "mlp_bf16",
                             "mlp_int8w", "xla_int8"]

    G = GEMM
    a_bf = jnp.asarray(rng.standard_normal((G, G)), dt)
    b_bf = jnp.asarray(rng.standard_normal((G, G)), dt)
    a_q = jnp.asarray(rng.integers(-127, 128, (G, G)), jnp.int8)
    b_q = jnp.asarray(rng.integers(-127, 128, (G, G)), jnp.int8)
    gemm_flops = 2 * G * G * G

    x = jnp.asarray(rng.standard_normal((B, N, C)), dt)
    w1 = jnp.asarray(rng.standard_normal((C, H)) * 0.1, dt)
    w2 = jnp.asarray(rng.standard_normal((H, C)) * 0.1, dt)
    w1f = np.asarray(w1, np.float32)
    w2f = np.asarray(w2, np.float32)
    s1 = np.abs(w1f).max(0, keepdims=True) / 127.0
    s2 = np.abs(w2f).max(0, keepdims=True) / 127.0
    w1q = jnp.asarray(np.round(w1f / s1), jnp.int8)
    w2q = jnp.asarray(np.round(w2f / s2), jnp.int8)
    s1j, s2j = jnp.asarray(s1), jnp.asarray(s2)
    mlp_flops = 2 * 2 * B * N * C * H

    from mspi_tpu.ops.pallas.mlp import (_BWD_HIDDEN_BYTES, _fwd_tile,
                                         _tile_rows)
    tr = _fwd_tile(N, H, _tile_rows(N, H, _BWD_HIDDEN_BYTES))
    print(f"# gemm {G}^3 | mlp B={B} N={N} C={C} H={H} TR={tr} | "
          f"v5e peaks: bf16 197 TF/s, int8 394 TOP/s")

    variants = {
        "gemm_bf16": (lambda a: _gemm(a, b_bf, dt), a_bf, gemm_flops),
        "gemm_int8": (lambda a: _gemm(a, b_q, jnp.int8), a_q, gemm_flops),
        "mlp_bf16": (lambda x: _mlp_call(_mlp_bf16_kernel, x, [w1, w2], tr),
                     x, mlp_flops),
        "mlp_int8w": (lambda x: _mlp_call(_mlp_int8w_kernel, x,
                                          [w1q, s1j, w2q, s2j], tr),
                      x, mlp_flops),
        "xla_int8": (lambda a: jax.lax.dot_general(
            a, b_q, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int8),
            a_q, gemm_flops),
    }
    for name in names:
        fn, inp, flops = variants[name]
        try:
            ms, tf = bench(fn, inp, flops)
            print(f"{name:12s} {ms:8.3f} ms  {tf:7.2f} TFLOP(TOP)/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
