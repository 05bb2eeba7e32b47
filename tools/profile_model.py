"""Per-op TPU profile of the AVSP flagship forward — or full train step.

Captures a jax.profiler trace and aggregates device op durations from the
Chrome trace, printing the top ops — the measured answer to "where does the
time go" (SURVEY §7 step 8).

  python tools/profile_model.py [--backbone mvitv2s --batch 8
      --dtype bfloat16 --top 25]
  python tools/profile_model.py --train --batch 2 --dtype bfloat16

--train profiles the jitted train step (fwd + SalLoss + SimSiam + bwd +
AdamW, the engine_train.py hot loop) and additionally splits every op into
fwd/bwd/other using the HLO op_name metadata (ops inside the cotangent
computation carry "transpose(" in their jaxpr path)."""

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
    # skip aggregate lanes ("Steps" = whole-step spans, "XLA Modules" =
    # whole-program spans) — counting them once double-counted every leaf op
    skip_tids = {(e.get("pid"), e.get("tid"))
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name"
                 and e.get("args", {}).get("name") in ("Steps", "XLA Modules")}
    per_op = collections.Counter()
    per_cat = collections.Counter()
    per_phase = collections.Counter()          # fwd / bwd / optim
    per_phase_cat = collections.Counter()      # (phase, category)
    meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        if (e.get("pid"), e.get("tid")) in skip_tids:
            continue
        name = e.get("name", "?")
        # skip the enclosing program event (spans all child thunks —
        # counting it would double every leaf op)
        if name.startswith(("jit_", "jit__", "pjit")):
            continue
        a = e.get("args", {})
        # fwd/bwd attribution: the trace's tf_op is the jaxpr path
        # ("jit(train_step)/jvp(...)/..."); cotangent ops carry
        # "transpose(" in it; optax update ops attribute to optax source.
        tf_op = a.get("tf_op", "")
        src0 = a.get("source", "")
        if "optax" in src0 or "optax" in tf_op:
            phase = "optim"
        elif "transpose(" in tf_op:
            phase = "bwd"
        else:
            phase = "fwd"
        cat = name.rsplit(".", 1)[0]
        per_op[name] += e["dur"]
        per_cat[cat] += e["dur"]
        per_phase[phase] += e["dur"]
        per_phase_cat[(phase, cat)] += e["dur"]
        total += e["dur"]
        if name not in meta:
            src = src0
            # strip site-packages noise; keep repo-relative paths
            if "/site-packages/" in src:
                src = src.split("/site-packages/")[-1]
            meta[name] = {
                "source": src,
                "shape": a.get("shape_with_layout", "").split(":")[0],
                "phase": phase,
            }
    return (per_op.most_common(top), per_cat.most_common(top), total, meta,
            per_phase, per_phase_cat)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="mvitv2s")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--out", default="")
    p.add_argument("--train", action="store_true",
                   help="profile the full jitted train step instead of the "
                        "inference forward")
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

    if args.train:
        from mspi_tpu.train.engine import (create_train_state, make_optimizer,
                                           make_train_step)

        gt = jnp.asarray(rng.random((args.batch, h, w)).astype(np.float32)
                         + 1e-3)
        batch = {"clips": clips, "audio": audio, "gt": gt}
        tx = make_optimizer(cfg)
        state = create_train_state(cfg, variables, tx)
        step = make_train_step(model, tx, gamma=cfg.train.gamma, donate=False)

        def run():
            nonlocal state
            state, metrics = step(state, batch, 1e-4)
            jax.block_until_ready(metrics)
    else:
        fwd = jax.jit(lambda v, c, a: model.apply(v, c, a, train=False)[0])

        def run():
            fwd(variables, clips, audio).block_until_ready()

    run()  # compile

    out_dir = args.out or tempfile.mkdtemp(prefix="mspi_profile_")
    with trace(out_dir):
        for _ in range(3):
            run()

    result = summarize_trace(out_dir, args.top)
    if result is None:
        print(json.dumps({"error": "no trace produced", "dir": out_dir}))
        return
    top_ops, top_cats, total, meta, per_phase, per_phase_cat = result
    print(json.dumps({"trace_dir": out_dir, "total_us": round(total, 1)}))
    if args.train:
        print("-- by phase (fwd/bwd attribution via HLO op_name) --")
        for ph, dur in per_phase.most_common():
            print(f"{dur/1e3:10.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {ph}")
        print("-- by (phase, category) --")
        for (ph, cat), dur in per_phase_cat.most_common(args.top):
            print(f"{dur/1e3:10.2f} ms  {100*dur/max(total,1e-9):5.1f}%  "
                  f"{ph:5s}  {cat[:100]}")
    print("-- by op category --")
    for name, dur in top_cats:
        print(f"{dur/1e3:10.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {name[:110]}")
    print("-- by individual op (with HLO shape + source) --")
    for name, dur in top_ops:
        m = meta.get(name, {})
        extra = " ".join(filter(None, (m.get("phase", ""), m.get("shape", ""),
                                       m.get("source", ""))))
        print(f"{dur/1e3:10.2f} ms  {100*dur/max(total,1e-9):5.1f}%  "
              f"{name[:60]}  {extra[:120]}")


if __name__ == "__main__":
    main()
