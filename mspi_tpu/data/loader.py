"""Batching data loader with threaded prefetch.

Replaces torch DataLoader worker processes (train.py:125-137): a thread pool
decodes/reshapes samples ahead of the training step while the TPU computes —
JPEG decode and FFT hold the GIL only briefly (PIL/numpy release it), so
threads suffice and avoid process-spawn overhead.  Batches come out as numpy
dicts ready for device_put; clips stay uint8 until the fused on-device
normalisation.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Dict, Iterator, Optional

import numpy as np

from mspi_tpu.data.datasets import AVSPSample
from mspi_tpu.data.video import normalize_frames


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 4,
                 prefetch: int = 4, seed: int = 2023,
                 normalize_on_host: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.normalize_on_host = normalize_on_host

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def _collate(self, samples) -> Dict[str, np.ndarray]:
        clips = np.stack([s.clip for s in samples])  # [B,T,H,W,3] uint8
        if self.normalize_on_host:
            clips = normalize_frames(clips)
        batch = {
            "clips": clips,
            "audio": np.stack([s.audio for s in samples]),
            "gt": np.stack([s.gt for s in samples]),
        }
        if samples[0].fixation is not None:
            batch["fixations"] = np.stack([s.fixation for s in samples])
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        n = len(self)
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []
            submitted = 0

            def submit_next():
                nonlocal submitted
                idxs = order[submitted * self.batch_size:(submitted + 1) * self.batch_size]
                pending.append([pool.submit(self.dataset.__getitem__, int(i)) for i in idxs])
                submitted += 1

            while submitted < min(self.prefetch, n):
                submit_next()
            for _ in range(n):
                futs = pending.pop(0)
                if submitted < n:
                    submit_next()
                yield self._collate([f.result() for f in futs])


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Double-buffered host->HBM prefetch: `device_put` the next `size`
    batches while the device computes — the pin_memory + non-blocking
    copy of the reference's loader (SlowFast/slowfast/datasets/loader.py:
    87-178) expressed as JAX async transfers.  `sharding` (e.g.
    mspi_tpu.parallel.batch_sharding) places each leaf; None = default
    device."""
    import collections

    import jax

    queue = collections.deque()

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        return {k: jax.device_put(v, sharding(v.ndim) if callable(sharding)
                                  else sharding) for k, v in batch.items()}

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
