"""End-to-end train.py CLI smoke on the synthetic AVSP tree: epoch loop, LR
schedule application, validation gate, JSONL logs, checkpointing."""

import json
import os
import subprocess
import sys

import pytest

from tests.synthetic_data import build_avsp_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.timeout(900)
def test_train_cli_smoke(tmp_path):
    data_root = str(tmp_path / "AuViDataset")
    os.makedirs(data_root)
    # two videos so the batch-2 drop_last train loader yields a step
    build_avsp_tree(data_root, datasets=(("AVAD", "v1"), ("DIEM", "d1")),
                    size=(64, 96))
    log_dir = str(tmp_path / "logs")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single CPU device for the smoke run
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--motion_encoder", "s3d", "--data_root", data_root,
         "--log_dir", log_dir, "--epochs", "1", "--resolution", "64", "96",
         "--monitored_epochs", "1", "--save_ckpt_freq", "1",
         "--num_workers", "1", "--session_name", "smoke"],
        capture_output=True, text=True, timeout=850, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]

    runs = os.listdir(log_dir)
    assert len(runs) == 1
    run_dir = os.path.join(log_dir, runs[0])
    log_file = os.path.join(run_dir, "log", "log.txt")
    assert os.path.exists(log_file)
    records = [json.loads(l) for l in open(log_file)]
    assert len(records) == 1
    rec = records[0]
    assert "train_loss" in rec and "val_loss" in rec  # epoch 1 is monitored
    assert rec["epoch"] == 0 and rec["n_parameters"] > 0
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "ckpt_1"))
