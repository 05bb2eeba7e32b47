"""Per-op TPU profile of the AVSP flagship forward.

Captures a jax.profiler trace of one batched forward and aggregates device
op durations from the Chrome trace, printing the top ops — the measured
answer to "where does the time go" (SURVEY §7 step 8).

  python tools/profile_model.py [--backbone mvitv2s --batch 8
      --dtype bfloat16 --top 25]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def summarize_trace(trace_dir: str, top: int):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid names containing "TPU"/"Device"; fall back to all
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items()
                   if any(k in n for k in ("TPU", "Device", "/device"))}
    per_op = collections.Counter()
    per_cat = collections.Counter()
    meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        # skip the enclosing program event (spans all child thunks —
        # counting it would double every leaf op)
        if name.startswith(("jit_", "jit__", "pjit")):
            continue
        per_op[name] += e["dur"]
        per_cat[name.rsplit(".", 1)[0]] += e["dur"]
        total += e["dur"]
        if name not in meta:
            a = e.get("args", {})
            src = a.get("source", "")
            # strip site-packages noise; keep repo-relative paths
            if "/site-packages/" in src:
                src = src.split("/site-packages/")[-1]
            meta[name] = {
                "source": src,
                "shape": a.get("shape_with_layout", "").split(":")[0],
            }
    return per_op.most_common(top), per_cat.most_common(top), total, meta


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="mvitv2s")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--out", default="")
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
    from mspi_tpu.utils.profiling import trace

    cfg = get_config(args.backbone)
    res_env = os.environ.get("MSPI_BENCH_RES")  # e.g. "224,224" for morphmlps
    if res_env:
        cfg = get_config(args.backbone, {
            "data": {"resolution": tuple(int(x) for x in res_env.split(","))}})
    h, w = cfg.data.resolution
    model = AudioVisualSaliencyModel(cfg=cfg)
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.standard_normal(
        (args.batch, cfg.data.num_frames, h, w, 3)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal(
        (args.batch, *cfg.data.spectro_shape, 1)).astype(np.float32))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                               clips[:1], audio[:1]))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    fwd = jax.jit(lambda v, c, a: model.apply(v, c, a, train=False)[0])
    fwd(variables, clips, audio).block_until_ready()  # compile

    out_dir = args.out or tempfile.mkdtemp(prefix="mspi_profile_")
    with trace(out_dir):
        for _ in range(3):
            fwd(variables, clips, audio).block_until_ready()

    result = summarize_trace(out_dir, args.top)
    if result is None:
        print(json.dumps({"error": "no trace produced", "dir": out_dir}))
        return
    top_ops, top_cats, total, meta = result
    print(json.dumps({"trace_dir": out_dir, "total_us": round(total, 1)}))
    print("-- by op category --")
    for name, dur in top_cats:
        print(f"{dur/1e3:10.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {name[:110]}")
    print("-- by individual op (with HLO shape + source) --")
    for name, dur in top_ops:
        m = meta.get(name, {})
        extra = " ".join(filter(None, (m.get("shape", ""), m.get("source", ""))))
        print(f"{dur/1e3:10.2f} ms  {100*dur/max(total,1e-9):5.1f}%  "
              f"{name[:60]}  {extra[:120]}")


if __name__ == "__main__":
    main()
