"""Seeding + JAX PRNG key management.

The reference fixes python/numpy/torch seeds and cuDNN determinism
(s3prl/run_downstream.py:202-212). In JAX randomness is explicit: we keep a
`KeySeq` that deterministically splits from a root key, which makes every
stochastic op (masking, dropout, specaug) reproducible and resume-stable.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def fix_random_seeds(seed: int = 1337) -> None:
    random.seed(seed)
    np.random.seed(seed)


class KeySeq:
    """A stateful sequence of PRNG keys split from a root seed.

    Stateful on the *host* only — inside jit you always pass explicit keys.
    `take()` returns a fresh key; `at(step)` returns a key deterministically
    derived from the step number (resume-stable regardless of call history).
    """

    def __init__(self, seed: int = 0):
        self._root = jax.random.key(seed)
        self._count = 0

    def take(self) -> jax.Array:
        key = jax.random.fold_in(self._root, self._count)
        self._count += 1
        return key

    def at(self, step: int) -> jax.Array:
        return jax.random.fold_in(self._root, step)
