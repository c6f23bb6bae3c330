"""Task contract.

Behavioral spec from the reference's Task base (s3prl/task/base.py:17-73):
a task owns the trainable downstream module and defines per-step loss +
cacheable outputs and a `reduction` that folds cached step outputs into
scalar logs per mode (train/valid/test).

JAX split of responsibilities:
- `loss_and_cache` is PURE and jittable — it sees upstream hidden states,
  batch device arrays, and trainable params; its cache is device arrays.
- `reduction` runs on host over records; each record is the numpy-fied cache
  merged with the batch's host-side fields named in `host_keys` (strings
  can't cross into jit).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class Task:
    """Base class; subclasses set `module` and implement the three hooks."""

    #: flax module mapping (hs, h_lens, ...) -> task outputs
    module: nn.Module
    #: batch keys that must be carried host-side into reduction records
    host_keys: Tuple[str, ...] = ()

    def init_params(self, key: jax.Array, hs, h_lens, batch) -> Any:
        return self.module.init(key, hs, h_lens)["params"]

    def loss_and_cache(
        self, params, hs, h_lens, batch: Dict[str, Any], rng, train: bool
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        raise NotImplementedError

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        raise NotImplementedError

    # optional: name of the metric used for valid-best tracking + direction
    valid_metric: str = "loss"
    valid_higher_better: bool = False
