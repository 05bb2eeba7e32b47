"""Name the batch-8 training OOM (r5, VERDICT item 6).

Compiles the flagship train step at a given batch (no run needed — the OOM
is a RUNTIME RESOURCE_EXHAUSTED; compilation succeeds) and prints the XLA
compiled-memory analysis plus the largest live buffers from the buffer
assignment, so "batch 8 OOMs" becomes "buffer X of Y MB grew".

  python tools/mem_analysis_train.py --batch 8 --dtype bfloat16
  python tools/mem_analysis_train.py --batch 4 --dtype bfloat16   # compare

Reference hot loop whose memory is being accounted:
/root/reference/engine_train.py:11-81.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="mvitv2s")
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--top", default=25, type=int)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mspi_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.dtype == "bfloat16":
        from mspi_tpu.ops.layers import set_default_compute_dtype

        set_default_compute_dtype(jnp.bfloat16)

    from mspi_tpu.config import get_config
    from mspi_tpu.models.fusion import AudioVisualSaliencyModel
    from mspi_tpu.train.engine import (create_train_state, make_optimizer,
                                       make_train_step)

    h, w = 224, 384
    cfg = get_config(args.backbone,
                     overrides={"data": {"resolution": (h, w)}})
    model = AudioVisualSaliencyModel(cfg=cfg)
    rng = np.random.default_rng(0)
    B = args.batch
    batch = {
        "clips": jnp.asarray(rng.standard_normal((B, 16, h, w, 3)).astype(np.float32)),
        "audio": jnp.asarray(rng.standard_normal((B, 257, 111, 1)).astype(np.float32)),
        "gt": jnp.asarray(rng.random((B, h, w)).astype(np.float32) + 1e-3),
    }
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                               batch["clips"][:1],
                                               batch["audio"][:1]))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx)
    body_fn = make_train_step(model, tx, gamma=1.0, donate=False, jit=False)

    lowered = jax.jit(body_fn).lower(state, batch, 1e-4)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    if ma is not None:
        gb = 1024 ** 3
        print(f"batch {B}: argument {ma.argument_size_in_bytes/gb:.2f} GiB, "
              f"output {ma.output_size_in_bytes/gb:.2f} GiB, "
              f"temp {ma.temp_size_in_bytes/gb:.2f} GiB, "
              f"generated code {ma.generated_code_size_in_bytes/2**20:.1f} MiB, "
              f"alias {ma.alias_size_in_bytes/gb:.2f} GiB")
        total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
        print(f"peak (arg+out+temp-alias) ~ {total/gb:.2f} GiB "
              f"(v5e HBM = 16 GiB)")
    # largest allocations from the buffer assignment dump
    try:
        txt = compiled.as_text()
    except Exception:
        txt = ""
    allocs = re.findall(
        r"allocation \d+: size (\d+)(?:, parameter| ,|,)?([^\n]*)", txt)
    if allocs:
        rows = sorted(((int(s), d.strip()) for s, d in allocs), reverse=True)
        print(f"\ntop {args.top} allocations:")
        for s, d in rows[:args.top]:
            print(f"  {s/2**20:9.1f} MiB  {d[:110]}")
    else:
        # fall back: biggest HLO buffers by shape in the optimized module
        shapes_ = re.findall(r"(bf16|f32|u8|s32)\[([0-9,]+)\]", txt)
        sizes = {}
        for dt, dims in shapes_:
            n = int(np.prod([int(x) for x in dims.split(",")]))
            b = n * (2 if dt == "bf16" else 4 if dt in ("f32", "s32") else 1)
            key = f"{dt}[{dims}]"
            sizes[key] = (b, sizes.get(key, (0, 0))[1] + 1)
        rows = sorted(sizes.items(), key=lambda kv: -kv[1][0])
        print(f"\ntop {args.top} HLO shapes (size x count):")
        for key, (b, cnt) in rows[:args.top]:
            print(f"  {b/2**20:9.1f} MiB x{cnt:3d}  {key}")


if __name__ == "__main__":
    main()
