"""Kernel lab for the ConvNeXt 7x7 depthwise conv (VERDICT r2 #1: ~11 ms of
the flagship step is VPU-bound depthwise convs under XLA).

Depthwise conv has no channel contraction, so it can never ride the MXU —
the question is only whether a Pallas shift-and-FMA kernel with perfect VMEM
reuse beats XLA's lowering at the ConvNeXt stage shapes, and by how much.

Variants (per stage shape [B, H, W, C], 7x7, stride 1, pad 3, bf16):

  xla     lax.conv_general_dilated with feature_group_count=C (what
          mspi_tpu/ops/layers.py:conv2d emits today)
  pallas  grid over B; whole padded image in a VMEM scratch that persists
          across grid steps (borders zeroed once at step 0), 49 statically
          unrolled shifted multiply-adds accumulated in fp32

Reference op being accelerated: timm ConvNeXtBlock conv_dw
(/root/reference/model/model_utils.py:306-354 uses the same blocks in the
decoder).

Usage: python tools/bench_dwconv.py [stage ...]   (default: all four)
Env: MSPI_LAB_ITERS=50
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

ITERS = int(os.environ.get("MSPI_LAB_ITERS", "50"))

# flagship ConvNeXt-T stage shapes at 224x384, batch 8 x 16 frames
STAGES = {
    "s0": (128, 56, 96, 96),
    "s1": (128, 28, 48, 192),
    "s2": (128, 14, 24, 384),
    "s3": (128, 7, 12, 768),
}
K = 7
P = K // 2


def xla_dwconv(x, k, b):
    # [B,H,W,C] x [KH,KW,1,C] -> [B,H,W,C]; torch Conv2d groups=C semantics
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=[(P, P), (P, P)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])
    return y + b


def _dw_kernel(x_ref, k_ref, b_ref, out_ref, xpad_ref):
    H, W, C = out_ref.shape[1:]

    @pl.when(pl.program_id(0) == 0)
    def _zero_borders():
        xpad_ref[...] = jnp.zeros_like(xpad_ref)

    xpad_ref[P:P + H, P:P + W, :] = x_ref[0]
    acc = jnp.broadcast_to(b_ref[0].astype(jnp.float32), (H, W, C))
    for i in range(K):
        for j in range(K):
            acc = acc + (xpad_ref[i:i + H, j:j + W, :].astype(jnp.float32)
                         * k_ref[i * K + j].astype(jnp.float32))
    out_ref[0] = acc.astype(out_ref.dtype)


def pallas_dwconv(x, k, b):
    B, H, W, C = x.shape
    kr = k.reshape(K * K, 1, C)  # [49,1,C]: per-tap lane-aligned rows
    return pl.pallas_call(
        _dw_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * K, 1, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2 * P, W + 2 * P, C), x.dtype)],
    )(x, kr, b.reshape(1, C))


def main():
    names = sys.argv[1:] or list(STAGES)
    dt = jnp.bfloat16
    for name in names:
        B, H, W, C = STAGES[name]
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
        k = jnp.asarray(rng.standard_normal((K, K, 1, C)) * 0.1, dt)
        b = jnp.asarray(rng.standard_normal(C) * 0.1, dt)

        flops = B * H * W * C * K * K * 2
        hbm_ms = (2 * B * H * W * C * 2) / 819e9 * 1e3
        print(f"# {name}: [{B},{H},{W},{C}] {flops/1e9:.2f} GFLOP "
              f"| HBM roofline {hbm_ms:.3f} ms")

        want = None
        for vname, fn in (("xla", xla_dwconv),
                          ("pallas", lambda x, k, b: pallas_dwconv(
                              x, k.reshape(K, K, C), b))):
            @jax.jit
            def run_n(x, n, fn=fn):
                def body(_, c):
                    y = fn(c, k, b)
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
                got = np.asarray(fn(x, k, b) if vname == "xla" else
                                 fn(x, k, b), np.float32)
                if want is None:
                    want = got
                    err = 0.0
                else:
                    err = float(np.max(np.abs(got - want)))
                print(f"  {vname:8s} {ms:7.3f} ms  "
                      f"({flops/ms*1e3/1e12:.2f} TFLOP/s)  max|err|={err:.2e}")
            except Exception as e:  # noqa: BLE001
                print(f"  {vname:8s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
