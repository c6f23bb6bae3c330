"""MOS prediction task (reference: downstream/mos_prediction).

Behavioral spec from the reference expert (downstream/mos_prediction/
model.py:35-73, expert.py:118-175): every utterance is scored per 1 s
segment (0.5 s hop) by a mean-net (self-attention pooling + linear, optional
tanh*2+3 clipping); training adds a judge-bias net (judge embedding added to
the features, its own pooling + linear, bias score = bias + segment score)
and minimizes

    segment_weight * MSE(seg_scores, utt_mean)
  + bias_weight   * MSE(bias_utt_score, judge_opinion)
  +                 MSE(utt_score, utt_mean)

Evaluation reports utterance- and system-level MSE / LCC (Pearson) / SRCC
(Spearman) like expert.py:214-260.

TPU adaptation (documented divergence): the reference re-runs the upstream
on every 1 s wav segment (utility.py unfold_segments). Here the upstream
runs once per utterance and the unfold happens on the 50 fps feature frames
(windows of `seg_frames`=50, hop 25) — identical up to conv-edge effects,
one static-shaped upstream call instead of a data-dependent segment batch.
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import Task
from ..nn.upstream import Featurizer


class MosDownstreamModule(nn.Module):
    """Featurizer + segment mean-net + judge bias-net.

    __call__(hs, h_lens, judge_ids=None) ->
        (seg_scores[B, S], bias_scores[B, S] | None, seg_mask[B, S])
    """

    num_layers: int
    projector_dim: int = 256
    num_judges: int = 5000
    clipping: bool = True
    attention_pooling: bool = True
    seg_frames: int = 50   # 1 s at the 50 fps SSL frame rate
    hop_frames: int = 25   # 0.5 s hop

    @nn.compact
    def __call__(self, hs, h_lens, judge_ids=None, train: bool = False):
        feat, _ = Featurizer(self.num_layers, name="featurizer")(hs, h_lens)
        B, T, H = feat.shape
        W, hop = self.seg_frames, self.hop_frames
        n_seg = max(T // hop, 1) if T > W else 1
        pad_to = (n_seg - 1) * hop + W
        feat = jnp.pad(feat, ((0, 0), (0, max(pad_to - T, 0)), (0, 0)))
        starts = jnp.arange(n_seg) * hop
        segs = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(feat, s, W, axis=1),
            out_axes=1,
        )(starts)  # [B, S, W, H]
        x = nn.Dense(self.projector_dim, name="connector")(
            segs.reshape(B * n_seg, W, H).astype(jnp.float32))

        def pool_score(y, att_name, lin_name):
            if self.attention_pooling:
                att = nn.Dense(1, name=att_name)(y)
                pooled = (y * jax.nn.softmax(att, axis=1)).sum(axis=1)
                return nn.Dense(1, name=lin_name)(pooled)[:, 0]
            return nn.Dense(1, name=lin_name)(y)[..., 0].mean(axis=-1)

        seg = pool_score(x, "mean_net_pooling", "mean_net_linear")
        if self.clipping:
            seg = jnp.tanh(seg) * 2.0 + 3.0
        seg_scores = seg.reshape(B, n_seg)

        n_valid = jnp.where(h_lens <= W, 1, h_lens // hop)
        n_valid = jnp.clip(n_valid, 1, n_seg)
        seg_mask = (jnp.arange(n_seg)[None] < n_valid[:, None]).astype(jnp.float32)

        bias_scores = None
        if judge_ids is not None:
            emb = nn.Embed(self.num_judges, self.projector_dim,
                           name="judge_embedding")(judge_ids)  # [B, D]
            bx = x.reshape(B, n_seg, W, -1) + emb[:, None, None, :]
            bx = bx.reshape(B * n_seg, W, -1)
            bias = pool_score(bx, "bias_net_pooling", "bias_net_linear")
            bias_scores = bias.reshape(B, n_seg) + seg_scores
        return seg_scores, bias_scores, seg_mask


class MosPredictionTask(Task):
    """Batch: x wavs, 'mean' [B] f32, 'mos' [B] f32 (judge opinion),
    'judge_id' [B] int, host 'system_name' + 'unique_name'."""

    def __init__(self, module: MosDownstreamModule, segment_weight: float = 1.0,
                 bias_weight: float = 1.0):
        self.module = module
        self.segment_weight = segment_weight
        self.bias_weight = bias_weight
        self.host_keys = ("system_name", "unique_name")

    valid_metric = "utt_MSE"
    valid_higher_better = False

    def init_params(self, key, hs, h_lens, batch):
        return self.module.init(
            key, hs, h_lens, judge_ids=batch.get("judge_id"))["params"]

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        judge_ids = batch.get("judge_id") if train else None
        seg_scores, bias_scores, mask = self.module.apply(
            {"params": params}, hs, h_lens, judge_ids=judge_ids, train=train)
        denom = jnp.maximum(mask.sum(-1), 1.0)
        utt_score = (seg_scores * mask).sum(-1) / denom
        mean = batch["mean"].astype(jnp.float32)
        seg_loss = (((seg_scores - mean[:, None]) ** 2) * mask).sum() / jnp.maximum(
            mask.sum(), 1.0)
        utt_loss = ((utt_score - mean) ** 2).mean()
        loss = self.segment_weight * seg_loss + utt_loss
        if bias_scores is not None:
            bias_utt = (bias_scores * mask).sum(-1) / denom
            bias_loss = ((bias_utt - batch["mos"].astype(jnp.float32)) ** 2).mean()
            loss = loss + self.bias_weight * bias_loss
        return loss, {
            "loss": loss,
            "prediction": utt_score,
            "mean": mean,
        }

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        from scipy import stats

        pred = np.concatenate([np.atleast_1d(r["prediction"]) for r in records])
        true = np.concatenate([np.atleast_1d(r["mean"]) for r in records])
        out = {
            "loss": float(np.mean([float(r["loss"]) for r in records])),
            "utt_MSE": float(np.mean((pred - true) ** 2)),
        }
        if len(pred) > 1 and np.std(pred) > 0 and np.std(true) > 0:
            out["utt_LCC"] = float(np.corrcoef(pred, true)[0, 1])
            out["utt_SRCC"] = float(stats.spearmanr(pred, true).statistic)
        systems = []
        for r in records:
            systems.extend(r.get("system_name", []))
        if systems and len(systems) == len(pred):
            by_sys: Dict[str, list] = {}
            for s, p, t in zip(systems, pred, true):
                by_sys.setdefault(s, []).append((p, t))
            sp = np.asarray([np.mean([x[0] for x in v]) for v in by_sys.values()])
            st_ = np.asarray([np.mean([x[1] for x in v]) for v in by_sys.values()])
            out["sys_MSE"] = float(np.mean((sp - st_) ** 2))
            if len(sp) > 1 and np.std(sp) > 0 and np.std(st_) > 0:
                out["sys_LCC"] = float(np.corrcoef(sp, st_)[0, 1])
                out["sys_SRCC"] = float(stats.spearmanr(sp, st_).statistic)
        return out
