"""Kernel lab for the fused LN+MLP (VERDICT r2 #2: 2.9 ms at the ConvNeXt
stage-0 shape vs 0.33 ms HBM / ~0.68 ms MXU roofline — find the bound).

Each variant is a standalone pallas_call on the stage-0 geometry
[B=128, N=5376, C=96, H=384] (bf16 storage, fp32 accum), timed with the
chained-program method (ROUND1_NOTES).  Decomposition ladder:

  xla          unfused jnp LN -> fc1 -> gelu -> fc2 (XLA's own fusion)
  prod         the production fused_ln_mlp kernel
  matmul       two matmuls only (no LN, identity activation) — MXU floor
  matmul_gelu  two matmuls + erf GELU (no LN) — adds the VPU poly
  ln_matmul    LN + two matmuls (identity activation) — adds the cross-lane
               LN reductions
  pipe2/pipe4  full LN+MLP with the row tile split k ways and the chunks'
               MXU/VPU ops interleaved so independent work can overlap
  mxu_stats    LN stats via an MXU matmul against [1|x] sufficient-stat
               lanes instead of VPU cross-lane reductions

Usage: python tools/bench_lnmlp.py [variant ...]   (default: all)
Env: MSPI_LAB_SHAPE=B,N,C,H  MSPI_LAB_ITERS=50
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MSPI_MLP_VMEM_BUDGET", str(8 * 1024 * 1024))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mspi_tpu.ops.pallas.mlp import (_erf, _gelu_f32, _INV_SQRT2, _ln_f32,
                                     fused_ln_mlp)
from mspi_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

SHAPE = tuple(int(x) for x in os.environ.get(
    "MSPI_LAB_SHAPE", "128,5376,96,384").split(","))
ITERS = int(os.environ.get("MSPI_LAB_ITERS", "50"))
EPS = 1e-6


def _specs(B, N, C, H, TR):
    x_spec = pl.BlockSpec((1, TR, C), lambda b, t: (b, t, 0),
                          memory_space=pltpu.VMEM)
    w_spec = lambda a, b_: pl.BlockSpec((a, b_), lambda b, t: (0, 0),
                                        memory_space=pltpu.VMEM)
    return x_spec, w_spec


def _call(kernel, x, g, be, w1, b1, w2, b2, tr):
    B, N, C = x.shape
    H = w1.shape[1]
    x_spec, w_spec = _specs(B, N, C, H, tr)
    return pl.pallas_call(
        kernel,
        grid=(B, N // tr),
        in_specs=[x_spec, w_spec(1, C), w_spec(1, C), w_spec(C, H),
                  w_spec(1, H), w_spec(H, C), w_spec(1, C)],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
    )(x, g.reshape(1, C), be.reshape(1, C), w1, b1.reshape(1, H), w2,
      b2.reshape(1, C))


# ---- kernel bodies ----

def _k_matmul(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[0]
    u = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = (u + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    out_ref[0] = (y + b2_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def _k_matmul_gelu(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   out_ref):
    x = x_ref[0]
    u = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    u = u + b1_ref[0].astype(jnp.float32)
    h = _gelu_f32(u).astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    out_ref[0] = (y + b2_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def _k_ln_matmul(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 out_ref):
    x = x_ref[0]
    _, _, _, z = _ln_f32(x, g_ref[0], be_ref[0], EPS)
    z = z.astype(x.dtype)
    u = jnp.dot(z, w1_ref[...], preferred_element_type=jnp.float32)
    h = (u + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    out_ref[0] = (y + b2_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def _k_pipe(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            *, k):
    """Full LN+MLP, row tile split into k chunks with the per-chunk MXU and
    VPU stages interleaved: chunk i's gelu (VPU) is independent of chunk
    i+1's fc1 (MXU), so the scheduler may overlap them."""
    x = x_ref[0]
    TR = x.shape[0]
    step = TR // k
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    b1 = b1_ref[0].astype(jnp.float32)
    b2 = b2_ref[0].astype(jnp.float32)

    us = []
    for i in range(k):
        xi = x[i * step:(i + 1) * step]
        _, _, _, z = _ln_f32(xi, g_ref[0], be_ref[0], EPS)
        us.append(jnp.dot(z.astype(x.dtype), w1,
                          preferred_element_type=jnp.float32) + b1)
    hs = [None] * k
    for i in range(k):
        hs[i] = _gelu_f32(us[i]).astype(x.dtype)
    for i in range(k):
        y = jnp.dot(hs[i], w2, preferred_element_type=jnp.float32) + b2
        out_ref[0, i * step:(i + 1) * step] = y.astype(out_ref.dtype)


def _k_mxu_stats(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 out_ref):
    """LN stats via MXU: rowsum(x) and rowsum(x^2) as one [TR, C] @ [C, 2*pad]
    matmul against constant 0/1 lanes — no VPU cross-lane reduction."""
    x = x_ref[0]
    TR, C = x.shape
    xf = x.astype(jnp.float32)
    # stat projector: col 0 = 1/C (mean), col 1..: built inline as constants
    ones = jnp.full((C, 1), 1.0 / C, jnp.float32)
    sq = xf * xf
    mu = jnp.dot(xf, ones, preferred_element_type=jnp.float32)     # [TR,1]
    m2 = jnp.dot(sq, ones, preferred_element_type=jnp.float32)     # [TR,1]
    var = m2 - mu * mu
    z = (xf - mu) * jax.lax.rsqrt(var + EPS)
    z = z * g_ref[0].astype(jnp.float32) + be_ref[0].astype(jnp.float32)
    z = z.astype(x.dtype)
    u = jnp.dot(z, w1_ref[...], preferred_element_type=jnp.float32)
    u = u + b1_ref[0].astype(jnp.float32)
    h = _gelu_f32(u).astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    out_ref[0] = (y + b2_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def _xla_ref(x, g, be, w1, b1, w2, b2):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mu * mu
    z = ((xf - mu) * jax.lax.rsqrt(var + EPS) * g + be).astype(x.dtype)
    u = jnp.dot(z, w1, preferred_element_type=jnp.float32) + b1
    h = (0.5 * u * (1.0 + _erf(u * _INV_SQRT2))).astype(x.dtype)
    return (jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
            ).astype(x.dtype)


def main():
    B, N, C, H = SHAPE
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, C)), dt)
    g = jnp.asarray(1 + 0.1 * rng.standard_normal(C), dt)
    be = jnp.asarray(0.1 * rng.standard_normal(C), dt)
    w1 = jnp.asarray(rng.standard_normal((C, H)) * 0.1, dt)
    b1 = jnp.asarray(rng.standard_normal(H) * 0.1, dt)
    w2 = jnp.asarray(rng.standard_normal((H, C)) * 0.1, dt)
    b2 = jnp.asarray(rng.standard_normal(C) * 0.1, dt)

    from mspi_tpu.ops.pallas.mlp import _BWD_HIDDEN_BYTES, _fwd_tile, _tile_rows
    tr = _fwd_tile(N, H, _tile_rows(N, H, _BWD_HIDDEN_BYTES))

    variants = {
        "xla": lambda x: _xla_ref(x, g, be, w1, b1, w2, b2),
        "prod": lambda x: fused_ln_mlp(x, g, be, w1, b1, w2, b2, eps=EPS),
        "matmul": lambda x: _call(_k_matmul, x, g, be, w1, b1, w2, b2, tr),
        "matmul_gelu": lambda x: _call(_k_matmul_gelu, x, g, be, w1, b1, w2,
                                       b2, tr),
        "ln_matmul": lambda x: _call(_k_ln_matmul, x, g, be, w1, b1, w2, b2,
                                     tr),
        "pipe2": lambda x: _call(functools.partial(_k_pipe, k=2), x, g, be,
                                 w1, b1, w2, b2, tr),
        "pipe4": lambda x: _call(functools.partial(_k_pipe, k=4), x, g, be,
                                 w1, b1, w2, b2, tr),
        "mxu_stats": lambda x: _call(_k_mxu_stats, x, g, be, w1, b1, w2, b2,
                                     tr),
    }
    names = sys.argv[1:] or list(variants)

    hbm_ms = (2 * B * N * C * 2) / 819e9 * 1e3
    mxu_ms = (2 * 2 * B * N * C * H) / 197e12 * 1e3
    print(f"# shape B={B} N={N} C={C} H={H} TR={tr} "
          f"| roofline HBM {hbm_ms:.2f} ms, MXU {mxu_ms:.2f} ms")

    for name in names:
        fn = variants[name]

        @jax.jit
        def run_n(x, n, fn=fn):
            def body(_, c):
                y = fn(c)
                return c + y * dt(1e-24)

            return jax.lax.fori_loop(0, n, body, x)

        try:
            run_n(x, 1).block_until_ready()
            t0 = time.perf_counter()
            run_n(x, ITERS + 1).block_until_ready()
            dt_n = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_n(x, 1).block_until_ready()
            dt_1 = time.perf_counter() - t0
            ms = (dt_n - dt_1) / ITERS * 1e3
            # parity vs the XLA reference (fp32-ish tolerance on bf16 data)
            got = np.asarray(fn(x), np.float32)
            want = np.asarray(_xla_ref(x, g, be, w1, b1, w2, b2), np.float32)
            err = float(np.max(np.abs(got - want)))
            print(f"{name:12s} {ms:7.3f} ms   max|err|={err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
