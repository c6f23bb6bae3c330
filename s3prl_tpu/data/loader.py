"""Minimal data loader: batch sampler + dataset -> collated numpy batches.

Replaces torch DataLoader workers with a background prefetch thread (audio
decode + collate overlap device compute; the heavy transforms — fbank,
masking, specaug — run on-device in jit, unlike the reference which does
them in DataLoader workers, pretrain/mockingjay/dataset.py:49-86).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Optional

from .collate import pad_collate


def _maybe_distribute(batch_sampler):
    """Under multi-host SPMD, each process loads only its round-robin share
    of the global batch stream — the analog of the reference engaging
    `DistributedBatchSamplerWrapper` under DDP (s3prl/problem/base.py:445-449).
    Single-process (the common case, and every test) is a no-op.
    """
    import jax

    if jax.process_count() <= 1:
        return batch_sampler
    from .sampler import DistributedBatchSamplerWrapper

    if isinstance(batch_sampler, DistributedBatchSamplerWrapper):
        return batch_sampler
    return DistributedBatchSamplerWrapper(
        batch_sampler, jax.process_count(), jax.process_index()
    )


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_sampler,
        collate_fn: Optional[Callable] = None,
        prefetch: int = 2,
        distribute: bool = True,
    ):
        self.dataset = dataset
        if distribute:
            batch_sampler = _maybe_distribute(batch_sampler)
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
