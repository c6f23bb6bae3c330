"""MOS predictor — finetuned upstream + featurizer + mean-net head.

Behavioral spec from the reference (s3prl/upstream/mos_prediction/):
- expert.py:46-95: each wav is unfolded into 1 s segments with 0.5 s hop
  (utility.py:4-16: one segment if len <= 16000 else len//8000 segments of a
  zero-padded wav), every segment runs through the finetuned upstream, a
  learned softmax layer-weighted sum (interfaces.py Featurizer:244-245), and
  the MosDownstream head; per-segment scores are averaged per utterance.
- model.py:5-72: MosDownstream = Linear connector -> mean_net_linear scored
  per frame and averaged over time (or SelfAttentionPooling when configured),
  with optional clipping `tanh(s)*2 + 3`.

Checkpoints store {"Upstream", "Featurizer", "Downstream", "Config"}
(expert.py:82-109).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .apc import APCConfig, APCModel
from .mockingjay import MockingjayConfig, MockingjayEncoder
from .wav2vec2 import BASE, Wav2Vec2Config, Wav2Vec2Trunk

SEG = 16000
STEP = 8000


@dataclass(frozen=True)
class MosConfig:
    upstream: str = "wav2vec2"  # "wav2vec2" | "apc" | "tera" (hubconf mos_*)
    trunk: Wav2Vec2Config = BASE
    apc: Optional[APCConfig] = None
    tera: Optional[MockingjayConfig] = None
    feat_kind: str = "mel"  # apc/tera front-end: "mel" or "fbank_delta"
    projector_dim: int = 256
    clipping: bool = False
    attention_pooling: bool = False

    @property
    def downsample_rate(self) -> int:
        return self.trunk.downsample_rate if self.upstream == "wav2vec2" else 160


class MosModel(nn.Module):
    cfg: MosConfig = MosConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wavs: jnp.ndarray, wav_lens: jnp.ndarray, deterministic=True):
        """Returns (hidden_states[1, B, T', 1] with the utterance score
        broadcast over time, feat_lens) — the reference's scalar-per-utt
        output exposed through the standard upstream contract."""
        cfg = self.cfg
        B, T = wavs.shape
        # segment into 1 s windows with 0.5 s hop (static count from padded
        # T). Reference unfold_segments (upstream/mos_prediction/utility.py):
        # pad to (len//step + 1)*step then unfold -> len//step segments for
        # len > seg (the last one is half zero-padding), 1 otherwise.
        n_seg = max(T // STEP, 1) if T > SEG else 1
        pad_to = (n_seg - 1) * STEP + SEG
        wavs_p = jnp.pad(wavs, ((0, 0), (0, max(pad_to - T, 0))))
        starts = jnp.arange(n_seg) * STEP
        segs = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(wavs_p, s, SEG, axis=1),
            out_axes=1,
        )(starts)  # [B, S, SEG]
        segs = segs.reshape(B * n_seg, SEG)
        seg_lens = jnp.full((B * n_seg,), SEG, jnp.int32)

        if cfg.upstream == "apc":  # mos_apc: APC GRU over log-mel
            feats, flens = self._features(segs, seg_lens)
            hs, _, _ = APCModel(cfg.apc or APCConfig(), name="apc")(
                feats, flens, train=not deterministic
            )
        elif cfg.upstream == "tera":  # mos_tera: TERA transformer over mel
            feats, flens = self._features(segs, seg_lens)
            hs, _ = MockingjayEncoder(
                cfg.tera or MockingjayConfig(input_dim=80), dtype=self.dtype,
                name="tera",
            )(feats, flens, deterministic=deterministic)
        else:
            hs, _ = Wav2Vec2Trunk(cfg.trunk, dtype=self.dtype, name="trunk")(
                segs, seg_lens, deterministic=deterministic
            )  # [L+1, B*S, T', C]
        w = self.param("featurizer_weights", nn.initializers.zeros, (hs.shape[0],))
        feat = jnp.einsum("l,lbtc->btc", jax.nn.softmax(w), hs.astype(jnp.float32))

        feat = nn.Dense(cfg.projector_dim, name="connector")(feat)
        if cfg.attention_pooling:
            att = nn.Dense(1, name="mean_net_pooling")(feat)  # SelfAttentionPooling.W
            pooled = (feat * jax.nn.softmax(att, axis=1)).sum(axis=1)
            seg_score = nn.Dense(1, name="mean_net_linear")(pooled)[:, 0]
        else:
            frame_scores = nn.Dense(1, name="mean_net_linear")(feat)[..., 0]
            seg_score = frame_scores.mean(axis=-1)
        if cfg.clipping:
            seg_score = jnp.tanh(seg_score) * 2.0 + 3.0

        seg_score = seg_score.reshape(B, n_seg)
        # average over the segments that exist for each true length
        n_valid = jnp.where(wav_lens <= SEG, 1, wav_lens // STEP)
        n_valid = jnp.clip(n_valid, 1, n_seg)
        seg_mask = (jnp.arange(n_seg)[None] < n_valid[:, None]).astype(seg_score.dtype)
        score = (seg_score * seg_mask).sum(-1) / seg_mask.sum(-1)

        # expose through the standard contract at the upstream's frame rate
        t_out = max(T // cfg.downsample_rate, 1)
        out_lens = jnp.maximum(wav_lens // cfg.downsample_rate, 1)
        out = jnp.broadcast_to(score[None, :, None, None], (1, B, t_out, 1))
        return out, out_lens

    def _features(self, wavs, wav_lens):
        """apc/tera acoustic front end (same policy as the hub entries)."""
        from .baseline import baseline_features
        from ..ops import audio as audio_ops

        if self.cfg.feat_kind == "fbank_delta":
            return baseline_features(
                wavs, wav_lens, feat_type="fbank", num_mel_bins=80,
                delta_order=2, cmvn=True,
            )
        feats, feat_lens = audio_ops.log_mel(wavs, wav_lens, n_mels=80)
        return audio_ops.cmvn(feats, feat_lens), feat_lens
