"""Data-loading speed benchmark.

Reference: SlowFast/slowfast/utils/benchmark.py:20 + tools/benchmark.py:15 —
measures loader throughput (clips/sec) without touching the model.

Usage:
  python tools/benchmark_data.py --data_root ./AuViDataset --dataset AVAD \
      [--mode test --batch_size 2 --num_workers 4 --steps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--dataset", default="AVAD")
    p.add_argument("--split", default=1, type=int)
    p.add_argument("--mode", default="test")
    p.add_argument("--batch_size", default=2, type=int)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--steps", default=20, type=int)
    args = p.parse_args()

    from mspi_tpu.data.datasets import AudioVisualDataset
    from mspi_tpu.data.loader import DataLoader

    ds = AudioVisualDataset(args.data_root, args.dataset, args.split, 16,
                            args.mode, True, (224, 384))
    loader = DataLoader(ds, args.batch_size, shuffle=(args.mode == "train"),
                        num_workers=args.num_workers)
    it = iter(loader)
    next(it)  # warm caches
    t0 = time.perf_counter()
    n = 0
    for i, batch in enumerate(it):
        n += len(batch["gt"])
        if i + 1 >= args.steps:
            break
    dt = time.perf_counter() - t0
    print({"clips_per_sec": round(n / dt, 2), "batches": i + 1,
           "workers": args.num_workers})


if __name__ == "__main__":
    main()
