"""data2vec audio pretraining — EMA-teacher masked regression.

Behavioral spec from the reference (s3prl/upstream/data2vec/
data2vec_model.py:428-600): the student trunk sees span-masked features; the
teacher (an EMA copy of the student) sees the clean input and produces the
regression target = the average of its top-K layer outputs (optionally
instance-normalized per layer); the loss is (smooth-)L2 on masked positions.

TPU rendering: the teacher lives as a second subtree of the param pytree
(`teacher`), excluded from gradients by stop_gradient and refreshed inside
the jitted train step via the Trainer's `post_update` hook (EMA of the
student subtree) — one XLA program, no host round trips.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .base import Task
from ..ops.masking import compute_mask_indices, length_mask


class Data2VecPretrainTask(Task):
    """module: a Wav2Vec2Trunk-like flax module
    (wavs, wav_lens, mask_indices, deterministic) -> (hidden_states, lens)."""

    def __init__(
        self,
        module,
        average_top_k_layers: int = 8,
        ema_decay: float = 0.999,
        mask_prob: float = 0.65,
        mask_length: int = 10,
        instance_norm_targets: bool = True,
    ):
        self.module = module
        self.k = average_top_k_layers
        self.ema_decay = ema_decay
        self.mask_prob = mask_prob
        self.mask_length = mask_length
        self.instance_norm_targets = instance_norm_targets
        self.host_keys = ()

    valid_metric = "loss"
    valid_higher_better = False

    def init_params(self, key, hs, h_lens, batch):
        student = self.module.init(
            key, batch["x"], batch["x_len"], None, deterministic=True
        )["params"]
        return {"student": student, "teacher": jax.tree_util.tree_map(jnp.copy, student)}

    def post_update(self, params):
        """EMA refresh of the teacher from the student (inside the jit step)."""
        d = self.ema_decay
        teacher = jax.tree_util.tree_map(
            lambda t, s: d * t + (1.0 - d) * s, params["teacher"], params["student"]
        )
        return {"student": params["student"], "teacher": teacher}

    def _targets(self, teacher_params, wavs, wav_lens):
        hs, lens = self.module.apply(
            {"params": teacher_params}, wavs, wav_lens, None, deterministic=True
        )
        top = hs[-self.k :]  # [K, B, T, C] (top-K layer states)
        if self.instance_norm_targets:
            mean = top.mean(axis=2, keepdims=True)
            var = top.var(axis=2, keepdims=True)
            top = (top - mean) * jax.lax.rsqrt(var + 1e-5)
        return jax.lax.stop_gradient(top.mean(axis=0)), lens  # [B, T, C]

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        wavs, wav_lens = batch["x"], batch["x_len"]
        k_mask, k_drop = jax.random.split(rng)
        targets, t_lens = self._targets(params["teacher"], wavs, wav_lens)
        B, T, C = targets.shape
        valid = length_mask(t_lens, T)
        mask = compute_mask_indices(
            k_mask, (B, T), ~valid, self.mask_prob, self.mask_length
        )
        student_hs, _ = self.module.apply(
            {"params": params["student"]}, wavs, wav_lens, mask,
            deterministic=not train, rngs={"dropout": k_drop} if train else None,
        )
        pred = student_hs[-1][:, :T]
        err = ((pred - targets) ** 2).mean(-1)  # L2 (loss_beta=0 default)
        sel = mask & valid
        loss = jnp.where(sel, err, 0.0).sum() / jnp.maximum(sel.sum(), 1)
        # target variance monitor (the reference aborts when it collapses)
        target_var = jnp.sqrt(targets.var(axis=(0, 1)) + 1e-6).mean()
        return loss, {"loss": loss, "target_var": target_var}

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        return {
            "loss": float(np.mean([float(r["loss"]) for r in records])),
            "target_var": float(np.mean([float(r["target_var"]) for r in records])),
        }
