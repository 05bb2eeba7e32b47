"""Tracing / profiling utilities.

Reference: the fvcore FlopCountAnalysis smoke tests (model/model_utils.py:
705-710, SlowFast/slowfast/utils/misc.py:139-173 incl. activation counts),
wall-clock/memory meters in MetricLogger, and the data-loader benchmark.

JAX-native: FLOPs and bytes come from XLA's own cost analysis of the
compiled program (more faithful than operator-table counting); traces go to
TensorBoard-compatible files via jax.profiler.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Compile fn on the current backend and report XLA's cost analysis
    (flops, bytes accessed, ...) — the FlopCountAnalysis equivalent."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # some backends return per-computation lists
        costs = costs[0] if costs else {}
    out = {k: float(v) for k, v in costs.items()
           if isinstance(v, (int, float)) and k in
           ("flops", "bytes accessed", "transcendentals", "utilization operand 0")}
    out.setdefault("flops", float(costs.get("flops", 0.0)) if costs else 0.0)
    return out


def flop_count_table(fn: Callable, *args) -> str:
    """One-line summary string (the reference prints fvcore's table after
    building a model as its de-facto graph smoke test)."""
    costs = cost_analysis(fn, *args)
    gflops = costs.get("flops", 0.0) / 1e9
    gbytes = costs.get("bytes accessed", 0.0) / 1e9
    return f"compiled program: {gflops:.2f} GFLOPs, {gbytes:.2f} GB accessed"


def param_count(params) -> int:
    import numpy as np

    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context -> TensorBoard / Perfetto-compatible files."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock steps/sec + clips/sec meter (MetricLogger mem/time lines)."""

    def __init__(self):
        self.t0: Optional[float] = None
        self.steps = 0
        self.samples = 0

    def start(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        self.samples = 0

    def step(self, batch_size: int):
        if self.t0 is None:
            self.start()
        self.steps += 1
        self.samples += batch_size

    def stats(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - (self.t0 or time.perf_counter()), 1e-9)
        return {"steps_per_sec": self.steps / dt,
                "clips_per_sec": self.samples / dt}


def live_arrays_mb() -> float:
    """Device memory currently held by live arrays (the
    torch.cuda.max_memory_allocated stand-in)."""
    total = 0
    for d in jax.live_arrays():
        total += d.nbytes
    return total / 1e6
