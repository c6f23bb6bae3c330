"""DistilHuBERT (distiller) — 2-layer student with multi-teacher-layer heads.

Behavioral spec from the reference (s3prl/upstream/distiller/model.py:17-270):
conv feature extractor (default mode) -> projection to 768 -> 2-layer
wav2vec2-style transformer -> an "expand-last" prediction stack
(Linear(768 -> inter*n_tasks) + GELU + per-task SplitLinear -> final_dim)
that regresses n_tasks=12 teacher layers. The SUPERB hidden_states are
[feat_final, layer hiddens..., the 12 head predictions]
(distiller/expert.py:44-60).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .convfe import DEFAULT_CONV_LAYERS, ConvFeatureExtractor
from .transformer import TransformerEncoder
from ..ops.masking import length_mask


@dataclass(frozen=True)
class DistillerConfig:
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_LAYERS
    extractor_mode: str = "default"
    encoder_layers: int = 2
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    layer_norm_first: bool = False
    conv_pos: int = 128
    conv_pos_groups: int = 16
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    final_dim: int = 768
    n_tasks: int = 12
    out_layer_inter_dim: int = -1  # -1 -> encoder_embed_dim

    @property
    def downsample_rate(self) -> int:
        out = 1
        for _, _, s in self.conv_feature_layers:
            out *= s
        return out


class SplitLinear(nn.Module):
    """Per-task linear over task slices (reference: distiller/module.py
    SplitLinear): [B, T, n*inter] -> [B, T, n, out] with independent weights."""

    inter_dim: int
    n_tasks: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, _ = x.shape
        x = x.reshape(B, T, self.n_tasks, self.inter_dim)
        w = self.param(
            "weight", nn.initializers.lecun_normal(),
            (self.n_tasks, self.inter_dim, self.out_dim),
        )
        b = self.param("bias", nn.initializers.zeros, (self.n_tasks, self.out_dim))
        return jnp.einsum("btni,nio->btno", x, w.astype(x.dtype)) + b.astype(x.dtype)


class DistillerModel(nn.Module):
    cfg: DistillerConfig = DistillerConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wavs, wav_lens, deterministic: bool = True):
        """Returns (hidden_states[1+L+n_tasks, B, T', C], feat_lens)."""
        cfg = self.cfg
        feat = ConvFeatureExtractor(
            cfg.conv_feature_layers, cfg.extractor_mode, False, self.dtype,
            name="feature_extractor",
        )(wavs, train=not deterministic)
        t_feat = feat.shape[1]
        # the distiller uses strict conv arithmetic for its pad mask
        # (model.py:272 cal_pad_mask), unlike hubert's block-folded rule
        from .convfe import conv_output_lengths

        feat_lens = jnp.minimum(
            conv_output_lengths(wav_lens, cfg.conv_feature_layers), t_feat
        )

        if cfg.conv_feature_layers[-1][0] != cfg.encoder_embed_dim:
            feat_final = nn.Dense(
                cfg.encoder_embed_dim, dtype=self.dtype, name="post_extract_proj"
            )(feat)
        else:
            feat_final = feat

        padding_mask = ~length_mask(feat_lens, t_feat)
        hidden, enc_hs = TransformerEncoder(
            embed_dim=cfg.encoder_embed_dim,
            ffn_dim=cfg.encoder_ffn_embed_dim,
            num_layers=cfg.encoder_layers,
            num_heads=cfg.encoder_attention_heads,
            layer_norm_first=cfg.layer_norm_first,
            dropout=cfg.dropout,
            activation_dropout=cfg.activation_dropout,
            attention_dropout=cfg.attention_dropout,
            conv_pos=cfg.conv_pos,
            conv_pos_groups=cfg.conv_pos_groups,
            dtype=self.dtype,
            name="encoder",
        )(feat_final, padding_mask, deterministic=deterministic)
        # layer hiddens as the reference's get_hidden: outputs of each layer
        layer_hiddens = jnp.concatenate([enc_hs[1:-1], hidden[None]], axis=0)

        inter = cfg.out_layer_inter_dim if cfg.out_layer_inter_dim > 0 else cfg.encoder_embed_dim
        x = nn.Dense(inter * cfg.n_tasks, dtype=self.dtype, name="out_expand")(hidden)
        x = nn.gelu(x, approximate=False)
        preds = SplitLinear(inter, cfg.n_tasks, cfg.final_dim, self.dtype, name="split_out")(x)
        preds = jnp.transpose(preds, (2, 0, 1, 3))  # [n_tasks, B, T, D]

        hidden_states = jnp.concatenate([feat_final[None], layer_hiddens, preds], axis=0)
        return hidden_states, feat_lens
