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
        k_drop, k_gumbel = jax.random.split(rng)
        pred, _ = self.module.apply(
            {"params": params}, feats, feat_lens, train=train,
            # "gumbel" feeds VQ-APC's gumbel-softmax codebooks (models/apc.py)
            rngs={"dropout": k_drop, "gumbel": k_gumbel} if train else None,
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


class NpcReconstructionTask(Task):
    """NPC: reconstruct each frame from its masked context (reference:
    s3prl/pretrain/npc/pretrain_expert.py — L1 between the masked-conv
    postnet prediction and the clean features, every valid frame).

    module: (feats, feat_lens, train) -> (pred[B, T, D], lens).
    """

    def __init__(self, module, loss: str = "L1"):
        self.module = module
        self.loss = loss
        self.host_keys = ()

    valid_metric = "loss"
    valid_higher_better = False

    def init_params(self, key, feats, feat_lens, batch):
        if feats.ndim == 4:
            feats = feats[0]
        # full variables dict: NPC's ConvBlocks carry batch_stats. Running
        # stats stay at their init values (batch statistics normalize each
        # train step; a documented simplification vs torch BN momentum).
        return self.module.init(key, feats, feat_lens)

    def loss_and_cache(self, params, feats, feat_lens, batch, rng, train):
        if feats.ndim == 4:
            feats = feats[0]
        variables = params if "params" in params else {"params": params}
        mutable = ["batch_stats"] if (train and "batch_stats" in variables) else False
        out = self.module.apply(
            variables, feats, feat_lens, train=train,
            rngs={"dropout": rng} if train else None,
            mutable=mutable,
        )
        (pred, _lens) = out[0] if mutable else out
        valid = length_mask(feat_lens, pred.shape[1])
        target = feats[:, : pred.shape[1]]
        diff = pred - target
        err = jnp.abs(diff) if self.loss == "L1" else diff ** 2
        denom = jnp.maximum(valid.sum(), 1) * feats.shape[-1]
        loss = jnp.where(valid[..., None], err, 0.0).sum() / denom
        return loss, {"loss": loss}

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        return {"loss": float(np.mean([float(r["loss"]) for r in records]))}


class SpecAugReconstructionTask(Task):
    """SpecAugment pretraining (reference: s3prl/pretrain/spec_augment/
    task.py generate_spec_aug_data): the input is corrupted with LD-policy
    time/frequency band masks and the model reconstructs the masked cells;
    the loss runs over masked positions only.

    module: (masked_feats, feat_lens, train) -> (pred[B, T, D], lens).
    """

    def __init__(
        self,
        module,
        loss: str = "L1",
        freq_mask_width: int = 27,
        freq_mask_num: int = 2,
        time_mask_width: int = 100,
        time_mask_num: int = 2,
    ):
        self.module = module
        self.loss = loss
        self.freq_mask_width = freq_mask_width
        self.freq_mask_num = freq_mask_num
        self.time_mask_width = time_mask_width
        self.time_mask_num = time_mask_num
        self.host_keys = ()

    valid_metric = "loss"
    valid_higher_better = False

    def init_params(self, key, feats, feat_lens, batch):
        if feats.ndim == 4:
            feats = feats[0]
        return self.module.init(key, feats, feat_lens)["params"]

    def loss_and_cache(self, params, feats, feat_lens, batch, rng, train):
        from ..nn.specaug import _band_mask

        if feats.ndim == 4:
            feats = feats[0]
        B, T, D = feats.shape
        k_f, k_t, k_drop = jax.random.split(rng, 3)
        fmask = _band_mask(k_f, B, D, self.freq_mask_num, self.freq_mask_width)
        tmask = _band_mask(k_t, B, T, self.time_mask_num, self.time_mask_width)
        valid = length_mask(feat_lens, T).astype(bool)
        # restrict BOTH mask kinds to valid frames — otherwise freq-masked
        # cells on padding enter the loss and train the model to
        # reconstruct zeros (the reference samples masks within spec_len)
        cell_mask = (fmask[:, None, :] | tmask[:, :, None]) & valid[:, :, None]
        masked = jnp.where(cell_mask, 0.0, feats)
        pred, _ = self.module.apply(
            {"params": params}, masked, feat_lens, train=train,
            rngs={"dropout": k_drop} if train else None,
        )
        target = feats[:, : pred.shape[1]]
        cell_mask = cell_mask[:, : pred.shape[1]]
        diff = pred - target
        err = jnp.abs(diff) if self.loss == "L1" else diff ** 2
        denom = jnp.maximum(cell_mask.sum(), 1)
        loss = jnp.where(cell_mask, err, 0.0).sum() / denom
        return loss, {"loss": loss}

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        return {"loss": float(np.mean([float(r["loss"]) for r in records]))}
