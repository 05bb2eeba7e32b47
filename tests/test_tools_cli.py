"""Smoke tests for the round-2 bench/convergence tools (CPU, tiny shapes):
tools/train_synthetic.py and tools/bench_e2e.py run end to end and print
their JSON summaries."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    return env


@pytest.mark.timeout(800)
def test_train_synthetic_smoke(tmp_path):
    out = str(tmp_path / "curve.jsonl")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_synthetic.py"),
         "--backbone", "s3d", "--steps", "3", "--batch", "2",
         "--res", "64,96", "--out", out],
        capture_output=True, text=True, timeout=750, env=_env(), cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert np.isfinite(summary["final_loss"])
    assert os.path.exists(out)


@pytest.mark.timeout(800)
def test_bench_e2e_smoke(tmp_path):
    # build the tree in tmp_path instead of /tmp
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from synthetic_data import build_avsp_tree

    root = str(tmp_path / "tree")
    build_avsp_tree(root, datasets=tuple(("AVAD", f"v{i}") for i in range(4)),
                    n_frames=40, size=(72, 96))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_e2e.py"),
         "--backbone", "s3d", "--batch", "2", "--steps", "3", "--workers", "2",
         "--res", "64,96", "--data_root", root],
        capture_output=True, text=True, timeout=750, env=_env(), cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["e2e_steps_per_sec"] > 0
    assert summary["compute_steps_per_sec"] > 0
