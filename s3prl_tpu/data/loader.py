"""Minimal data loader: batch sampler + dataset -> collated numpy batches.

Replaces torch DataLoader workers with a background prefetch thread (audio
decode + collate overlap device compute; the heavy transforms — fbank,
masking, specaug — run on-device in jit, unlike the reference which does
them in DataLoader workers, pretrain/mockingjay/dataset.py:49-86).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Optional

from .collate import pad_collate


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_sampler,
        collate_fn: Optional[Callable] = None,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.collate_fn = collate_fn or pad_collate
        self.prefetch = prefetch

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.batch_sampler, "set_epoch"):
            self.batch_sampler.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.batch_sampler)

    def _produce(self, q: queue.Queue) -> None:
        try:
            for indices in self.batch_sampler:
                items = [self.dataset[i] for i in indices]
                q.put(self.collate_fn(items))
            q.put(None)
        except BaseException as e:  # surface worker errors in the consumer
            q.put(e)

    def __iter__(self):
        if self.prefetch <= 0:
            for indices in self.batch_sampler:
                yield self.collate_fn([self.dataset[i] for i in indices])
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
