"""Measure the reference torch model's inference throughput on CPU (the
hardware actually available to torch in this image) and store it as the
bench.py baseline.

Runs the real reference AudioVisualSaliencyModel (S3D backbone, random
weights — throughput doesn't depend on weight values) on [1,3,16,224,384]
clips, matching inference.py's per-window forward.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import torch


def main():
    from _pytest.monkeypatch import MonkeyPatch

    from tests import test_fusion_model as tfm

    mp = MonkeyPatch()
    tfm._install_model_stubs(mp)
    tfm.RES = (224, 384)
    from model.model_utils import AudioVisualSaliencyModel as RefModel

    cfg = tfm._ref_cfg()
    cfg.MODEL.NUM_VIS_TOKENS = {"s3d": 4 * 7 * 12}
    torch.manual_seed(0)
    model = RefModel(cfg=cfg)
    model.eval()

    clips = torch.randn(1, 3, 16, 224, 384)
    audio = torch.randn(1, 1, 257, 111)

    with torch.no_grad():
        for _ in range(2):
            model(clips, audio)  # warmup
        n = 6
        t0 = time.perf_counter()
        for _ in range(n):
            model(clips, audio)
        dt = time.perf_counter() - t0

    clips_per_sec = n / dt
    out = {
        "torch_cpu_clips_per_sec": clips_per_sec,
        "model": "AudioVisualSaliencyModel(s3d)",
        "shape": [1, 3, 16, 224, 384],
        "threads": torch.get_num_threads(),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_BASELINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
