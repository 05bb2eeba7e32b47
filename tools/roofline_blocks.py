"""Bytes-based roofline of the flagship MViT trunk, block by block (r4).

VERDICT r3 item 2: the claim "the stage-1 trunk is memory-bound, ~25% MFU is
the ceiling" had no bytes behind it.  This tool measures each MultiScaleBlock
at its exact flagship shape (batch 8, bf16, 224x384 -> thw (8,56,96)) and
compares three numbers per block:

  t_meas   — chained-loop TPU time of the block alone (production Pallas path)
  t_mem    — minimal HBM bytes / v5e bandwidth (819 GB/s), where minimal =
             each fused region reads its inputs once and writes its outputs
             once: regions are {qkv dense, q/k/v pools, attention kernel,
             proj+residual, LN+MLP kernel+residual}; the hidden MLP tensor
             and attention scores never touch HBM (they live in VMEM in the
             fused kernels)
  t_mxu    — XLA-counted FLOPs (Pallas-disabled twin) / 197 TFLOP/s

A block is memory-bound iff t_mem > t_mxu; its roofline utilization is
max(t_mem, t_mxu) / t_meas.  The aggregate over stage-1 blocks answers
whether a per-block resident fusion (attention + residual + LN+MLP in one
kernel — saving ~2 full-size round trips per block) has headroom worth its
cost.

Reference trunk being measured: /root/reference/backbones/MViT.py:1311-1434.

  python tools/roofline_blocks.py [--batch 8 --iters 30] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_HBM_GBS = 819e9     # TPU v5e HBM bandwidth
V5E_BF16_FLOPS = 197e12


def block_min_bytes(B, thw_in, thw_q, thw_kv, cin, cout, heads, elt=2):
    """Minimal HBM traffic of one MultiScaleBlock at inference, counting each
    fused region's external inputs+outputs once (weights included; rel-pos
    one-hot aug lanes and the skip-pool path ignored — both < 3%)."""
    n_in = int(np.prod(thw_in))
    n_q = int(np.prod(thw_q))
    n_kv = int(np.prod(thw_kv))
    by = 0
    # norm1 + qkv dense: read x [N, cin], write packed q [N,cout] + kv [N,2cout]
    by += B * n_in * cin * elt + B * n_in * 3 * cout * elt
    by += (cin * 3 * cout + 3 * cout) * elt
    # pools: read the 3 streams, write pooled q/k/v
    by += B * n_in * 3 * cout * elt
    by += B * (n_q + 2 * n_kv) * cout * elt
    # attention kernel: read pooled q/k/v, write out [Nq, cout]
    by += B * (n_q + 2 * n_kv) * cout * elt + B * n_q * cout * elt
    # proj + residual: read out + skip x_pooled, write x' [Nq, cout]
    by += B * n_q * cout * elt * 3 + (cout * cout + cout) * elt
    # fused LN+MLP + residual: read x', write y, read x' again for the add
    # (XLA fuses the add into the kernel's consumer: x' stays resident in
    # practice — count 2 reads + 1 write to stay conservative)
    by += B * n_q * cout * elt * 3
    by += (cout * 4 * cout * 2 + 5 * cout) * elt  # W1+W2 (+biases)
    return by


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--json", default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mspi_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from mspi_tpu.ops.layers import set_default_compute_dtype

    set_default_compute_dtype(jnp.bfloat16)

    from mspi_tpu.config import get_config
    from mspi_tpu.models.mvit import MViTFeatures
    from mspi_tpu.utils.profiling import cost_analysis

    cfg = get_config("mvitv2s")
    mcfg = cfg.model.mvit
    feats = MViTFeatures(cfg=mcfg)
    B = args.batch
    h, w = cfg.data.resolution
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.standard_normal(
        (B, cfg.data.num_frames, h, w, 3)).astype(np.float32))

    shapes = jax.eval_shape(
        lambda: feats.init(jax.random.PRNGKey(0), clips[:1]))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    # stem -> token stream for block 0
    def run_stem(m, x):
        return m.patch_embed(x)

    x, thw = jax.jit(lambda v, c: feats.apply(v, c, method=run_stem))(
        variables, clips)
    x = x.astype(jnp.bfloat16)
    # thw comes back as traced device scalars — blocks branch on it with
    # python control flow, so it must be static ints
    thw = tuple(int(t) for t in thw)

    # static schedule metadata lives on the bound module (setup() ran)
    bound = feats.bind(variables)
    q_strides = bound._q_strides
    depth = len(q_strides)

    def time_block(i, x, thw):
        def one(v, x):
            return feats.apply(
                v, x, thw, False,
                method=lambda m, x_, thw_, tr: m.blocks.layers[i](x_, thw_, tr))

        jone = jax.jit(one)
        y, _ = jone(variables, x)
        jax.block_until_ready(y)

        @jax.jit
        def run_n(v, x, n):
            def body(_, carry):
                xc, acc = carry
                y, _ = one(v, xc)
                s = jnp.sum(y.astype(jnp.float32))
                # runtime-zero, non-foldable feedback (see bench.py)
                return (xc + (s * 1e-30 > 1.0).astype(xc.dtype), acc + s)

            _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return acc

        float(run_n(variables, x, 1))
        t0 = time.perf_counter()
        float(run_n(variables, x, args.iters + 1))
        dt_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_n(variables, x, 1))
        dt_1 = time.perf_counter() - t0
        ms = (dt_n - dt_1) / args.iters * 1e3

        os.environ["MSPI_DISABLE_PALLAS"] = "1"
        try:
            costs = cost_analysis(one, variables, x)
        finally:
            os.environ.pop("MSPI_DISABLE_PALLAS", None)
        return ms, costs.get("flops", 0.0), y

    rows = []
    for i in range(depth):
        blk = bound.blocks.layers[i]
        ms, flops, y = time_block(i, x, thw)
        thw_q = tuple(-(-t // st) for t, st in zip(thw, q_strides[i]))
        skv = getattr(blk, "stride_kv", (1, 1, 1)) or (1, 1, 1)
        thw_kv = tuple(-(-t // s) for t, s in zip(thw, skv))
        cin, cout = x.shape[-1], y.shape[-1]
        heads = blk.num_heads
        mb = block_min_bytes(B, thw, thw_q, thw_kv, cin, cout, heads)
        t_mem = mb / V5E_HBM_GBS * 1e3
        t_mxu = flops / V5E_BF16_FLOPS * 1e3
        rows.append({
            "block": i, "cin": int(cin), "cout": int(cout),
            "heads": int(heads), "n_in": int(np.prod(thw)),
            "ms": round(ms, 3), "min_bytes_mb": round(mb / 1e6, 1),
            "t_mem_ms": round(t_mem, 3), "t_mxu_ms": round(t_mxu, 3),
            "bound": "mem" if t_mem > t_mxu else "mxu",
            "roofline_util": round(max(t_mem, t_mxu) / max(ms, 1e-9), 3),
        })
        print(json.dumps(rows[-1]))
        x, thw = y, thw_q

    total_ms = sum(r["ms"] for r in rows)
    total_floor = sum(max(r["t_mem_ms"], r["t_mxu_ms"]) for r in rows)
    summary = {
        "total_ms": round(total_ms, 2),
        "total_roofline_floor_ms": round(total_floor, 2),
        "trunk_roofline_util": round(total_floor / max(total_ms, 1e-9), 3),
        "batch": B,
    }
    print(json.dumps(summary))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"blocks": rows, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
