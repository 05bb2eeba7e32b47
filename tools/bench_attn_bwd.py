"""Pooled-attention BACKWARD lab (r4): kernel-with-raised-VMEM vs the jnp
fallback at the shapes the r4 train profile showed falling back.

The flagship train step spends ~10% in the jnp bwd fallback of the MViT
stage-transition attention blocks (f32 [Nq,Nk] score tensors in HBM).
_bwd_vmem_bytes estimates those shapes at ~20 MB > the 14 MB default gate;
this lab measures whether Mosaic actually compiles + runs the one-kernel
bwd there with an explicit vmem_limit_bytes, and how it times against the
fallback.

  python tools/bench_attn_bwd.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (B, H, Nq, Nk, Da, Dv) — flagship batch-2 train shapes from the r4
# profile: stage-1->2, 2->3, 3->4 transition blocks (Da = head + rel lanes)
SHAPES = [
    (2, 1, 43008, 2688, 139, 96),
    (2, 2, 10752, 2688, 142, 96),
    (2, 4, 2688, 2688, 148, 96),
    (8, 2, 10752, 2688, 142, 96),  # batch-8 recipe
]


def main():
    import jax
    import jax.numpy as jnp

    from mspi_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from mspi_tpu.ops.pallas.pooled_attention import (_bwd_vmem_bytes, _tile,
                                                      fused_attention,
                                                      _BWD_SCORE_BYTES)

    rng = np.random.default_rng(0)

    def timed(f, *args):
        f(*args)[0].block_until_ready()  # compile
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        jax.block_until_ready(r)
        # D2H scalar read: axon block_until_ready ACKs early (ROUND3_NOTES)
        float(jnp.sum(r[0][0, 0, 0]))
        return (time.perf_counter() - t0) / n * 1e3

    for B, H, Nq, Nk, Da, Dv in SHAPES:
        q = jnp.asarray(rng.standard_normal((B, H, Nq, Da)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, Nk, Da)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, Nk, Dv)), jnp.bfloat16)

        tq = _tile(Nq, Nk, _BWD_SCORE_BYTES)
        need = _bwd_vmem_bytes(tq, Nk, Da, Dv)

        def make_grad():
            # fresh function identity -> fresh trace, so the env-dependent
            # bwd routing is re-evaluated
            return jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(
                    fused_attention(q, k, v).astype(jnp.float32)),
                argnums=(0, 1, 2)))

        os.environ.pop("MSPI_ATTN_BWD_VMEM_EXT", None)
        t_fb = float("nan")
        if os.environ.get("MSPI_LAB_FALLBACK", "1") != "0":
            try:
                t_fb = timed(make_grad(), q, k, v)
            except Exception as e:
                print("fallback failed:", repr(e)[:120])

        os.environ["MSPI_ATTN_BWD_VMEM_EXT"] = str(64 * 1024 * 1024)
        try:
            t_k = timed(make_grad(), q, k, v)
            err = ""
        except Exception as e:
            t_k = float("nan")
            err = repr(e)[:160]

        # bwd q-tile sweep under the raised limit (TQ=128 was forced by the
        # old 14 MB gate; bigger tiles amortize the per-step DMA overhead)
        sweep = []
        for tile in (256, 512):
            os.environ["MSPI_ATTN_TILE"] = str(tile)
            try:
                sweep.append((tile, timed(make_grad(), q, k, v)))
            except Exception as e:
                sweep.append((tile, float("nan")))
            os.environ.pop("MSPI_ATTN_TILE", None)
        os.environ.pop("MSPI_ATTN_BWD_VMEM_EXT", None)

        sw = "  ".join(f"tq{t}={ms:.3f}ms" for t, ms in sweep)
        print(f"B{B} H{H} Nq{Nq} Nk{Nk} Da{Da}: tq={tq} need={need/1e6:.1f}MB"
              f"  fallback={t_fb:.3f}ms  kernel={t_k:.3f}ms  {sw}  {err}")


if __name__ == "__main__":
    main()
