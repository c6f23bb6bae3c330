"""HuBERT masked-unit prediction pretraining task.

Behavioral spec from the reference (s3prl/upstream/hubert/hubert_model.py:
forward:465-560): span-mask conv features, predict k-means unit labels at
masked (and optionally unmasked) positions via cosine logits against learned
unit embeddings at temperature 0.1; cross-entropy over units.

TPU-first: mask sampling is the static-shape ops.masking.compute_mask_indices;
the loss is a masked CE over the full [B, T, num_units] logits (no ragged
index_select — masked positions are weighted, the rest zeroed).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .base import Task
from ..ops.masking import compute_mask_indices, length_mask


class HubertPretrainTask(Task):
    """module: HubertForPretrain-like — (wavs, wav_lens, mask_indices, det)
    -> (logits[B, T, num_units], feat_lens)."""

    def __init__(
        self,
        module,
        mask_prob: float = 0.8,
        mask_length: int = 10,
        pred_masked_weight: float = 1.0,
        pred_nomask_weight: float = 0.0,
    ):
        self.module = module
        self.mask_prob = mask_prob
        self.mask_length = mask_length
        self.pred_masked_weight = pred_masked_weight
        self.pred_nomask_weight = pred_nomask_weight
        self.host_keys = ()

    valid_metric = "masked_acc"
    valid_higher_better = True

    def init_params(self, key, wavs, wav_lens, batch):
        return self.module.init(
            key, batch["x"], batch["x_len"], None, deterministic=True
        )["params"]

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        # hs/h_lens unused: this task drives the trunk directly on waveform
        wavs, wav_lens = batch["x"], batch["x_len"]
        k_mask, k_drop = jax.random.split(rng)
        units = batch["units"]  # [B, T_feat] k-means labels, padded with -1

        # feature length == unit length by construction of prepare_data
        T_feat = units.shape[1]
        feat_valid = length_mask(jnp.minimum(h_lens, batch["units_len"]), T_feat)
        mask = compute_mask_indices(
            k_mask, (wavs.shape[0], T_feat), ~feat_valid,
            self.mask_prob, self.mask_length,
        )
        logits, feat_lens = self.module.apply(
            {"params": params}, wavs, wav_lens, mask,
            deterministic=not train, rngs={"dropout": k_drop} if train else None,
        )
        T = min(logits.shape[1], T_feat)
        logits, units_t = logits[:, :T], units[:, :T]
        mask_t, valid_t = mask[:, :T], feat_valid[:, :T]

        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.maximum(units_t, 0)
        )
        masked = mask_t & valid_t
        unmasked = (~mask_t) & valid_t
        loss_m = jnp.where(masked, ce, 0.0).sum() / jnp.maximum(masked.sum(), 1)
        loss_u = jnp.where(unmasked, ce, 0.0).sum() / jnp.maximum(unmasked.sum(), 1)
        loss = self.pred_masked_weight * loss_m + self.pred_nomask_weight * loss_u

        pred = jnp.argmax(logits, axis=-1)
        masked_correct = jnp.where(masked, pred == units_t, False)
        masked_acc = masked_correct.sum() / jnp.maximum(masked.sum(), 1)
        return loss, {"loss": loss, "loss_masked": loss_m, "masked_acc": masked_acc}

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        return {
            "loss": float(np.mean([float(r["loss"]) for r in records])),
            "masked_acc": float(np.mean([float(r["masked_acc"]) for r in records])),
        }
