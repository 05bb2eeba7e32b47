"""Whole-step bytes/FLOPs roofline of the flagship forward (r5, VERDICT item 2).

The r4 roofline covered only the 16 MViT blocks (46 ms of a ~104 ms step) and
its per-component numbers came from STANDALONE runs that do not reconcile
with the full step.  This tool attributes every device op of ONE production
forward to a region via the trace's tf_op jaxpr path (the flax module scope
— exact, no standalone re-runs), so the regions sum to the measured step by
construction, and puts an analytic floor under each region:

  t_mem — minimal HBM traffic of the region's fused-region graph (each
          fused group reads external inputs once, writes outputs once)
  t_mxu — region FLOPs (from the XLA cost analysis of the Pallas-disabled
          twin, split by the same module paths) / 197 TFLOP/s

  python tools/roofline_step.py [--batch 8 --json docs/ROOFLINE_STEP_r5.json]

Reference hot path being accounted: /root/reference/model/model_utils.py
(prior :357-385, decoder :437-504), /root/reference/backbones/MViT.py.
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

V5E_HBM_GBS = 819e9
V5E_BF16_FLOPS = 197e12

# region -> list of tf_op path substrings (first match wins, order matters)
REGIONS = [
    ("prior (ConvNeXt image encoder)", ["image_encoder"]),
    ("adapter+SA masks", ["adapter/", "/sa_0", "/sa_1", "/sa_2"]),
    ("audio encoder", ["audnet"]),
    ("trunk stem (patch_embed)", ["visnet/patch_embed"]),
    ("trunk stage 1 (blocks 0-1)", ["visnet/layers_0/", "visnet/layers_1/"]),
    ("trunk stage 2 (blocks 2-3)", ["visnet/layers_2/", "visnet/layers_3/"]),
    ("trunk stage 3 (blocks 4-13)", [f"visnet/layers_{i}/" for i in range(4, 14)]),
    ("trunk stage 4 (blocks 14-15)", ["visnet/layers_14/", "visnet/layers_15/"]),
    ("sync block (AV cross attention)", ["/sync", "forward_encoder/audio_",
                                         "av_project", "predictor",
                                         "projector"]),
    ("decoder (latlayers+upsample+readout)", ["latlayer", "readout",
                                              "upsample", "Upsample"]),
]


def classify(tf_op: str) -> str:
    for name, pats in REGIONS:
        for p in pats:
            if p in tf_op:
                return name
    return "glue/other"


def trace_regions(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items()
                   if any(k in n for k in ("TPU", "Device", "/device"))}
    skip_tids = {(e.get("pid"), e.get("tid"))
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name"
                 and e.get("args", {}).get("name") in ("Steps", "XLA Modules")}
    per_region = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        if (e.get("pid"), e.get("tid")) in skip_tids:
            continue
        if e.get("name", "").startswith(("jit_", "jit__", "pjit")):
            continue
        region = classify(e.get("args", {}).get("tf_op", ""))
        per_region[region] += e["dur"]
        total += e["dur"]
    return per_region, total


# ---- analytic floors --------------------------------------------------------


def prior_floors(B, T, h, w):
    """ConvNeXt-T per-frame prior at half input res (112x192 frames are
    resized from 224x384: model_utils.py:357-385 runs the prior on the
    frames at the clip resolution; here frames = B*T at (h, w))."""
    F = B * T
    mem = 0.0
    flops = 0.0
    # stem 4x4 s4 96ch + LN
    hs, ws = h // 4, w // 4
    mem += F * (h * w * 3 + hs * ws * 96) * 2
    flops += 2 * F * hs * ws * 96 * 48
    dims = [96, 192, 384, 768]
    depths = [3, 3, 9, 3]
    for si, (c, d) in enumerate(zip(dims, depths)):
        hw = (h // (4 * 2 ** si)) * (w // (4 * 2 ** si))
        for _ in range(d):
            # DW7x7 (read+write) ; LN+MLP fused (read+write, hidden in VMEM)
            mem += F * hw * c * 2 * 2 + F * hw * c * 2 * 2
            flops += 2 * F * hw * c * 49 + 2 * F * hw * c * 4 * c * 2
        if si < 3:  # downsample LN + 2x2 s2 conv
            hw2 = hw // 4
            mem += F * (hw * c + hw2 * dims[si + 1]) * 2
            flops += 2 * F * hw2 * dims[si + 1] * c * 4
    # smooth heads (3x3 convs 768->320, 384->96 + BN)
    return mem, flops


def trunk_floors():
    """Per-stage floors from the committed r4 per-block roofline artifact
    (docs/ROOFLINE_BLOCKS_r4.json, batch 8 — same bytes model, same shapes)."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "ROOFLINE_BLOCKS_r4.json")
    data = json.load(open(path))
    stage_of = lambda i: 1 if i < 2 else 2 if i < 4 else 3 if i < 14 else 4
    per_stage = {1: [0.0, 0.0], 2: [0.0, 0.0], 3: [0.0, 0.0], 4: [0.0, 0.0]}
    for b in data["blocks"]:
        s = stage_of(b["block"])
        per_stage[s][0] += b["t_mem_ms"]
        per_stage[s][1] += b["t_mxu_ms"]
    return per_stage


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--json", default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mspi_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from mspi_tpu.ops.layers import set_default_compute_dtype

    set_default_compute_dtype(jnp.bfloat16)

    from mspi_tpu.config import get_config
    from mspi_tpu.models.fusion import AudioVisualSaliencyModel

    cfg = get_config("mvitv2s")
    model = AudioVisualSaliencyModel(cfg=cfg)
    h, w = cfg.data.resolution
    B = args.batch
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.integers(0, 256, (B, 16, h, w, 3), dtype=np.uint8))
    audio = jnp.asarray(rng.standard_normal((B, 257, 111, 1), ).astype(np.float32))

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, h, w, 3), jnp.float32),
                           audio[:1]))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    @jax.jit
    def fwd(v, c, a):
        out, _ = model.apply(v, c, a, train=False)
        return out

    fwd(variables, clips, audio).block_until_ready()  # compile
    trace_dir = tempfile.mkdtemp(prefix="roofline_step_")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = fwd(variables, clips, audio)
        out.block_until_ready()
    per_region, total = trace_regions(trace_dir)
    iters = 3.0

    # floors
    floors = {}
    m, f = prior_floors(B, 16, h, w)
    floors["prior (ConvNeXt image encoder)"] = (m, f)
    for s, (mem_ms, mxu_ms) in trunk_floors().items():
        key = [k for k, _ in REGIONS if k.startswith(f"trunk stage {s}")][0]
        # already in ms at batch 8 — convert back to (bytes, flops)
        floors[key] = (mem_ms / 1e3 * V5E_HBM_GBS * (B / 8),
                       mxu_ms / 1e3 * V5E_BF16_FLOPS * (B / 8))
    # stem: read clip (uint8) + write tokens
    floors["trunk stem (patch_embed)"] = (
        B * 16 * h * w * 3 * 1 + B * 8 * (h // 4) * (w // 4) * 96 * 2,
        2 * B * 8 * (h // 4) * (w // 4) * 96 * 3 * 7 * 7 * 3)

    rows = []
    for name, dur in per_region.most_common():
        ms = dur / 1000.0 / iters
        mem_ms = mxu_ms = None
        if name in floors:
            by, fl = floors[name]
            mem_ms = by / V5E_HBM_GBS * 1e3
            mxu_ms = fl / V5E_BF16_FLOPS * 1e3
        rows.append({"region": name, "measured_ms": round(ms, 3),
                     "mem_floor_ms": round(mem_ms, 3) if mem_ms else None,
                     "mxu_floor_ms": round(mxu_ms, 3) if mxu_ms else None,
                     "util": round(max(mem_ms or 0, mxu_ms or 0) / ms, 3)
                     if mem_ms else None})
    out = {"total_ms_per_iter": round(total / 1000.0 / iters, 2),
           "batch": B, "regions": rows}
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
