"""tools/run_net.py smoke: train one epoch of the X3D classifier on a
synthetic Kinetics-style frame tree (small crops)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_k400_tree(root, rng, n_videos=4, n_frames=24):
    from PIL import Image

    os.makedirs(root)
    lines = {"train": [], "val": []}
    for i in range(n_videos):
        d = os.path.join(root, f"vid{i}")
        os.makedirs(d)
        for f in range(n_frames):
            img = (rng.random((80, 96, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(d, f"{f:05d}.jpg"))
        lines["train"].append(f"{d} {i % 2}")
        lines["val"].append(f"{d} {i % 2}")
    for split, ls in lines.items():
        with open(os.path.join(root, f"{split}.csv"), "w") as f:
            f.write("\n".join(ls) + "\n")


@pytest.mark.timeout(800)
def test_run_net_train_smoke(tmp_path, rng):
    data_dir = str(tmp_path / "k400")
    _build_k400_tree(data_dir, rng)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_net.py"),
         "--model", "x3dl", "--data_dir", data_dir, "--mode", "train",
         "--num_classes", "2", "--epochs", "1", "--batch_size", "2",
         "--num_frames", "8", "--sampling_rate", "2", "--crop_size", "64"],
        capture_output=True, text=True, timeout=750, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    stats = [json.loads(l) for l in lines]
    assert any("train" in s for s in stats)
    assert any("val" in s for s in stats)
    train_stats = next(s["train"] for s in stats if "train" in s)
    assert np.isfinite(train_stats["loss"])

@pytest.mark.timeout(900)
def test_run_net_ssl_smoke(tmp_path, rng):
    data_dir = str(tmp_path / "k400_ssl")
    _build_k400_tree(data_dir, rng)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_net.py"),
         "--task", "ssl", "--ssl_objective", "simclr", "--model", "s3d",
         "--data_dir", data_dir, "--epochs", "1", "--batch_size", "2",
         "--num_frames", "16", "--sampling_rate", "1", "--crop_size", "64",
         "--optimizer", "sgd"],
        capture_output=True, text=True, timeout=850, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    stats = [json.loads(l) for l in proc.stdout.splitlines()
             if l.startswith("{")]
    ssl = next(s["ssl"] for s in stats if "ssl" in s)
    assert ssl["objective"] == "simclr" and np.isfinite(ssl["loss"])


@pytest.mark.timeout(900)
def test_run_net_masked_smoke(tmp_path, rng):
    data_dir = str(tmp_path / "k400_masked")
    _build_k400_tree(data_dir, rng, n_videos=2, n_frames=8)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_net.py"),
         "--task", "masked", "--masked_target", "hog",
         "--data_dir", data_dir, "--epochs", "1", "--batch_size", "2",
         "--num_frames", "4", "--sampling_rate", "1", "--crop_size", "64"],
        capture_output=True, text=True, timeout=850, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    stats = [json.loads(l) for l in proc.stdout.splitlines()
             if l.startswith("{")]
    mk = next(s["masked"] for s in stats if "masked" in s)
    assert mk["target"] == "hog" and np.isfinite(mk["loss"])
