"""DistilHuBERT pretraining — multi-layer teacher distillation.

Behavioral spec from the reference (s3prl/pretrain/distiller/
pretrain_expert.py:242-375): a frozen teacher upstream (HuBERT by default)
produces hidden states on the raw wav; the student DistillerModel emits
n_tasks predictions (one per `pred_layer_id` teacher layer); the loss is
L1(pred, teacher_layer) plus an optional cosine term
`-logsigmoid(cos(pred, target))` weighted by `cosine_loss`.

TPU rendering: the teacher IS the Trainer's frozen upstream — its hidden
states arrive as `hs` (already under stop_gradient, train/trainer.py:110-117),
so the whole distillation step is one XLA program with no second model pass.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .base import Task
from ..ops.masking import length_mask


class DistillerPretrainTask(Task):
    """module: DistillerModel — (wavs, wav_lens, deterministic) ->
    (hidden_states[1 + L + n_tasks, B, T, D], feat_lens)."""

    def __init__(
        self,
        module,
        n_tasks: int,
        pred_layer_id: Sequence[int],
        loss_type: str = "l1",
        cosine_loss: float = 1.0,
    ):
        assert len(pred_layer_id) == n_tasks
        self.module = module
        self.n_tasks = n_tasks
        self.pred_layer_id = tuple(pred_layer_id)
        self.loss_type = loss_type
        self.cosine_loss = cosine_loss
        self.host_keys = ()

    valid_metric = "loss"
    valid_higher_better = False

    def init_params(self, key, hs, h_lens, batch):
        return self.module.init(
            key, batch["x"], batch["x_len"], deterministic=True
        )["params"]

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        # hs: the frozen teacher's hidden states [L_t+1, B, T, D]
        student_hs, s_lens = self.module.apply(
            {"params": params}, batch["x"], batch["x_len"],
            deterministic=not train, rngs={"dropout": rng} if train else None,
        )
        preds = student_hs[-self.n_tasks :]  # [N, B, T, D]
        targets = jnp.stack([hs[i] for i in self.pred_layer_id])  # [N, B, T, D]

        T = min(preds.shape[2], targets.shape[2])
        preds = preds[:, :, :T].astype(jnp.float32)
        targets = jax.lax.stop_gradient(targets[:, :, :T].astype(jnp.float32))
        valid = length_mask(jnp.minimum(s_lens, h_lens), T)[None, :, :, None]

        diff = preds - targets
        err = jnp.abs(diff) if self.loss_type == "l1" else diff ** 2
        denom = jnp.maximum(valid.sum(), 1) * preds.shape[0] * preds.shape[-1]
        rec_loss = jnp.where(valid, err, 0.0).sum() / denom

        loss = rec_loss
        sim_loss = jnp.float32(0.0)
        if self.cosine_loss > 0:
            cos = (preds * targets).sum(-1) * jax.lax.rsqrt(
                jnp.maximum((preds ** 2).sum(-1) * (targets ** 2).sum(-1), 1e-8)
            )
            sim = -jax.nn.log_sigmoid(cos)[..., None]
            sim_loss = jnp.where(valid, sim, 0.0).sum() / denom * preds.shape[-1]
            loss = loss + self.cosine_loss * sim_loss

        return loss, {"loss": loss, "rec_loss": rec_loss, "sim_loss": sim_loss}

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for k in ("loss", "rec_loss", "sim_loss"):
            out[k] = float(np.mean([float(r[k]) for r in records]))
        return out
