"""Masked / autoregressive acoustic reconstruction tasks (SSL pretraining).

Behavioral spec from the reference's pretraining recipes:
- masked reconstruction (mockingjay / tera / audio_albert): MAM-masked
  features -> encoder -> SpecPredictionHead -> L1 (or MSE) on masked frames
  (s3prl/pretrain/mockingjay/pretrain_expert.py + task/feat_reconstruction_task.py);
- autoregressive reconstruction (APC/VQ-APC): predict features `n_future`
  frames ahead with L1 (s3prl/task/autoregressive_reconstruction_task.py,
  pretrain/apc/).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .base import Task
from ..ops.mam import mam_mask
from ..ops.masking import length_mask


class MaskedReconstructionTask(Task):
    """module: (masked_feats, feat_lens, train) -> (pred[B,T,D], lens)."""

    def __init__(
        self,
        module,
        loss: str = "L1",
        mask_proportion: float = 0.15,
        mask_consecutive: int = 7,
        mask_frequency: float = 0.0,
    ):
        self.module = module
        self.loss = loss
        self.mask_kwargs = dict(
            mask_proportion=mask_proportion,
            mask_consecutive=mask_consecutive,
            mask_frequency=mask_frequency,
        )
        self.host_keys = ()

    valid_metric = "loss"
    valid_higher_better = False

    def init_params(self, key, feats, feat_lens, batch):
        if feats.ndim == 4:
            feats = feats[0]
        return self.module.init(key, feats, feat_lens)["params"]

    def loss_and_cache(self, params, feats, feat_lens, batch, rng, train):
        if feats.ndim == 4:  # stacked single-layer upstream output [1,B,T,D]
            feats = feats[0]
        k_mask, k_drop = jax.random.split(rng)
        masked, label_mask = mam_mask(k_mask, feats, feat_lens, **self.mask_kwargs)
        pred, _ = self.module.apply(
            {"params": params}, masked, feat_lens, train=train,
            rngs={"dropout": k_drop} if train else None,
        )
        target = feats[:, : pred.shape[1]]
        label_mask = label_mask[:, : pred.shape[1]]
        diff = pred - target
        err = jnp.abs(diff) if self.loss == "L1" else diff ** 2
        denom = jnp.maximum(label_mask.sum(), 1) * feats.shape[-1]
        loss = jnp.where(label_mask[..., None], err, 0.0).sum() / denom
        return loss, {"loss": loss}

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        return {"loss": float(np.mean([float(r["loss"]) for r in records]))}


class AutoregressiveReconstructionTask(Task):
    """Predict features n_future frames ahead (APC objective)."""

    def __init__(self, module, n_future: int = 5, loss: str = "L1"):
        self.module = module
        self.n_future = n_future
        self.loss = loss
        self.host_keys = ()

    valid_metric = "loss"
    valid_higher_better = False

    def init_params(self, key, feats, feat_lens, batch):
        if feats.ndim == 4:
            feats = feats[0]
        return self.module.init(key, feats, feat_lens)["params"]

    def loss_and_cache(self, params, feats, feat_lens, batch, rng, train):
        if feats.ndim == 4:  # stacked single-layer upstream output [1,B,T,D]
            feats = feats[0]
        pred, _ = self.module.apply(
            {"params": params}, feats, feat_lens, train=train,
            rngs={"dropout": rng} if train else None,
        )
        n = self.n_future
        target = feats[:, n:]
        pred = pred[:, :-n] if n > 0 else pred
        valid = length_mask(jnp.maximum(feat_lens - n, 0), target.shape[1])
        diff = pred - target
        err = jnp.abs(diff) if self.loss == "L1" else diff ** 2
        denom = jnp.maximum(valid.sum(), 1) * feats.shape[-1]
        loss = jnp.where(valid[..., None], err, 0.0).sum() / denom
        return loss, {"loss": loss}

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        return {"loss": float(np.mean([float(r["loss"]) for r in records]))}
