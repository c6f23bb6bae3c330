"""Wall-time benchmarking context, TPU-aware.

Mirrors the tag API of the reference's util/benchmark.py:24-40 (which used
torch.cuda.synchronize); here we block on JAX async dispatch instead.
"""

from __future__ import annotations

import logging
import time
from collections import defaultdict
from contextlib import contextmanager

import jax

logger = logging.getLogger(__name__)

_STATS = defaultdict(list)


@contextmanager
def benchmark(name: str, sync=None):
    """Time a block; `sync` is an optional array/pytree to block on."""
    start = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        elapsed = time.perf_counter() - start
        _STATS[name].append(elapsed)
        mean = sum(_STATS[name]) / len(_STATS[name])
        logger.info(f"[benchmark] {name}: {elapsed:.4f}s (mean {mean:.4f}s)")


def benchmark_stats() -> dict:
    return {k: dict(n=len(v), mean=sum(v) / len(v), total=sum(v)) for k, v in _STATS.items()}


def reset_benchmark_stats() -> None:
    _STATS.clear()
