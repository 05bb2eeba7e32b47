"""Kernel lab: fused_dwconv3d (Pallas, VMEM-resident receptive field) vs
XLA's 5-D depthwise lowering, at the model's stride-1 depthwise-conv3d
shapes (MViT pool convs, UniFormer pos_embed/CBlock convs).

XLA's *2-D* depthwise path is near speed-of-light (tools/bench_dwconv.py);
this lab measures the 5-D gap that motivated ops/pallas/dwconv.py.

Usage: python tools/bench_dwconv3d.py [name ...]   (default: all)
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

from mspi_tpu.ops.pallas.dwconv import (_xla_conv, dwconv3d_supported,
                                        fused_dwconv3d)
from mspi_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

ITERS = int(os.environ.get("MSPI_LAB_ITERS", "50"))

# [B, T, H, W, C], kernel — batch-8 flagship / batch-4 uniformerb shapes
CASES = {
    "mvit_s1_qpool": ((8, 8, 56, 96, 96), (3, 3, 3)),
    "mvit_s2_qpool": ((16, 8, 28, 48, 96), (3, 3, 3)),
    "mvit_s4_kvpool": ((64, 8, 7, 12, 96), (3, 3, 3)),
    "uni_s1_pos": ((4, 8, 56, 96, 64), (3, 3, 3)),
    "uni_s1_attn": ((4, 8, 56, 96, 64), (5, 5, 5)),
    "uni_s2_attn": ((4, 8, 28, 48, 128), (5, 5, 5)),
}


def main():
    names = sys.argv[1:] or list(CASES)
    rng = np.random.default_rng(0)
    for name in names:
        shape, kernel = CASES[name]
        B, T, H, W, C = shape
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((*kernel, 1, C)), jnp.bfloat16)
        gflop = 2 * np.prod(shape) * np.prod(kernel) / 1e9
        sup = dwconv3d_supported(shape, kernel, (1, 1, 1))
        for label, fn in [("xla", _xla_conv),
                          ("pallas", lambda x, w: fused_dwconv3d(x, w))]:
            if label == "pallas" and not sup:
                print(f"{name:16s} pallas: unsupported (VMEM)")
                continue

            @jax.jit
            def run_n(x, w, n, fn=fn):
                def body(_, c):
                    return fn(c * (1.0 / (1.0 + jnp.max(jnp.abs(c[0, 0, 0, 0])))), w)
                out = jax.lax.fori_loop(0, n, body, x)
                # scalar result: the timing sync is a D2H read (the axon
                # tunnel ACKs block_until_ready asynchronously — see
                # CLAUDE.md / bench.py)
                return jnp.float32(jnp.max(jnp.abs(out[0, 0, 0])))

            float(run_n(x, w, 1))
            t0 = time.perf_counter()
            float(run_n(x, w, 1))
            t1 = time.perf_counter()
            float(run_n(x, w, ITERS + 1))
            t2 = time.perf_counter()
            per = ((t2 - t1) - (t1 - t0)) / ITERS
            print(f"{name:16s} {label:6s} {per * 1e3:7.3f} ms  "
                  f"{gflop / per / 1e3:6.2f} TFLOP/s")


if __name__ == "__main__":
    main()
