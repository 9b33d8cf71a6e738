"""Host-side batch pipeline: bucketed batching + background prefetch.

Capability parity with the reference's torch DataLoader(batch 16, 16
workers, pin_memory) at /root/reference/train.py:82-83. TPU redesign:
batches are grouped per length bucket (static XLA shapes), assembled by a
background thread pool, and double-buffered ahead of the device so the
accelerator never waits on the host.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from vcvits_tpu.config import DataConfig
from vcvits_tpu.data.collate import bucket_lengths, collate, pick_bucket
from vcvits_tpu.data.dataset import VoiceConversionDataset


class BucketedLoader:
    """Yields padded batches; each batch's items share one length bucket."""

    def __init__(
        self,
        dataset: VoiceConversionDataset,
        cfg: DataConfig,
        batch_size: int,
        seed: int = 1234,
        drop_last: bool = True,
        shuffle: bool = True,
    ):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.seed = seed
        self.drop_last = drop_last
        self.shuffle = shuffle
        self.buckets = bucket_lengths(cfg)
        self._epoch = 0

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def epoch_batches(self, epoch: Optional[int] = None) -> Iterator[Dict[str, np.ndarray]]:
        ep = epoch if epoch is not None else self._epoch
        rng = random.Random(self.seed + ep)
        self._epoch += 1
        if hasattr(self.dataset, "set_epoch"):
            # per-epoch augmentation policies (preload random pitch shift)
            self.dataset.set_epoch(ep)
        order = list(range(len(self.dataset)))
        if self.shuffle:
            rng.shuffle(order)

        pools: Dict[int, List[int]] = {b: [] for b in self.buckets}
        for idx in order:
            item = self.dataset.get_item(idx)
            b = pick_bucket(len(item["x_wav"]), self.buckets)
            pools[b].append(idx)
            if len(pools[b]) == self.batch_size:
                items = [self.dataset.get_item(i) for i in pools[b]]
                yield collate(items, self.cfg, b, rng)
                pools[b] = []
        if not self.drop_last:
            for b, pool in pools.items():
                if pool:
                    items = [self.dataset.get_item(i) for i in pool]
                    # pad batch to full size by repeating (keeps shapes static)
                    while len(items) < self.batch_size:
                        items.append(items[len(items) % len(pool)])
                    yield collate(items, self.cfg, b, rng)


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Run `iterator` in a background thread, keeping `size` items ready."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: List[BaseException] = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
