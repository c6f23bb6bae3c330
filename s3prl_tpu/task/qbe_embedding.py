"""Learned query-by-example embedding task (reference: downstream/
quesst14_embedding/expert.py:89-125 + model.py, downstream/sws2013).

A query and a candidate document are embedded by connector -> LSTM ->
tanh -> attentive pooling; training minimizes the cosine-embedding loss
(pos: 1 - cos, neg: clamp(cos - margin, 0), margin 0 for quesst14 and -1
for sws2013 — sws2013/config.yaml lossrc.margin).

TPU adaptation (documented divergence): batches are (query, doc, label)
PAIRS — the reference scores each query against a variable-length list of
candidates and takes the max similarity (expert.py:103-113); fixed pairs
keep shapes static. The loss on each scored pair is identical.
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import Task
from ..nn.upstream import Featurizer
from ..ops.masking import length_mask


class QbeEmbedder(nn.Module):
    """connector -> unidirectional LSTM stack -> tanh -> attentive pooling
    (quesst14_embedding/model.py:6-29); padding frames are masked out of the
    pooling (the reference pools over padding — masking strictly helps)."""

    num_layers_upstream: int
    bottleneck_dim: int = 256
    hidden_dim: int = 1024
    num_layers: int = 2

    @nn.compact
    def __call__(self, hs, h_lens, train: bool = False):
        feat, _ = Featurizer(self.num_layers_upstream, name="featurizer")(hs, h_lens)
        x = nn.relu(nn.Dense(self.bottleneck_dim, name="connector")(
            feat.astype(jnp.float32)))
        for i in range(self.num_layers):
            x = nn.RNN(nn.OptimizedLSTMCell(self.hidden_dim),
                       name=f"lstm_{i}")(x, seq_lengths=h_lens)
        x = jnp.tanh(x)
        att = nn.Dense(1, name="attention_linear")(x)[..., 0]
        valid = length_mask(h_lens, x.shape[1])
        att = jnp.where(valid, att, -1e9)
        w = jax.nn.softmax(att, axis=-1)
        return jnp.einsum("bt,bth->bh", w, x)


class QbeEmbeddingTask(Task):
    """Batch: x = interleaved [query_0..query_B, doc_0..doc_B] wavs,
    'pair_label' [B] in {+1, -1}."""

    def __init__(self, module: QbeEmbedder, margin: float = 0.0):
        self.module = module
        self.margin = margin
        self.host_keys = ("unique_name",)

    valid_metric = "loss"
    valid_higher_better = False

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        emb = self.module.apply(
            {"params": params}, hs, h_lens, train=train,
            rngs={"dropout": rng} if train else None,
        )
        n = emb.shape[0] // 2
        q, d = emb[:n], emb[n : 2 * n]
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
        dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        sim = (qn * dn).sum(-1)
        labels = batch["pair_label"][:n].astype(jnp.float32)
        pos = jnp.where(labels > 0, 1.0 - sim, 0.0)
        neg = jnp.where(labels < 0, jnp.maximum(sim - self.margin, 0.0), 0.0)
        loss = (pos + neg).sum() / n
        return loss, {"loss": loss, "similarity": sim, "pair_label": labels}

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        sims = np.concatenate([np.atleast_1d(r["similarity"]) for r in records])
        labels = np.concatenate([np.atleast_1d(r["pair_label"]) for r in records])
        out = {"loss": float(np.mean([float(r["loss"]) for r in records]))}
        pos, neg = sims[labels > 0], sims[labels < 0]
        if len(pos) and len(neg):
            # pairwise retrieval AUC: P(pos pair scores above neg pair)
            out["pair_auc"] = float((pos[:, None] > neg[None, :]).mean())
        return out
