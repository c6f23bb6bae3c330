"""MR-HuBERT — hourglass multi-resolution HuBERT.

Behavioral spec from the reference (s3prl/upstream/multires_hubert/
hubert_model.py: MultiresHubertModel:337, ConvDownsampler/ConvUpsampler/
ConvAdapter:970-1267): conv waveform features feed an hourglass of
transformer encoders — a full-rate pre-encoder (with conv pos emb), a conv
downsampler to the lower label rate, a middle encoder (no pos conv), a conv
upsampler back to full rate, and a post-encoder with a residual skip from
the pre-encoder.

API deviation (documented): the reference exposes a per-layer *list* of
downsample rates (nn/upstream.py:134-140) and its own Featurizer cannot
weighted-sum across heterogeneous rates anyway; here the low-rate middle
states are nearest-neighbor upsampled to the full 320-sample rate so all
hidden states share one stride and the standard SUPERB probes apply
directly.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from .convfe import DEFAULT_CONV_LAYERS, ConvFeatureExtractor
from .transformer import TransformerEncoder
from ..ops.masking import length_mask


@dataclass(frozen=True)
class MultiresHubertConfig:
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    pre_layers: int = 4
    middle_layers: int = 4
    post_layers: int = 4
    ratio: int = 2  # label-rate ratio between resolutions
    extractor_mode: str = "default"
    conv_pos: int = 128
    conv_pos_groups: int = 16
    dropout: float = 0.1
    attention_dropout: float = 0.1
    normalize: bool = False


class MultiresHubertModel(nn.Module):
    cfg: MultiresHubertConfig = MultiresHubertConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wavs, wav_lens, deterministic: bool = True):
        cfg = self.cfg
        if cfg.normalize:
            from .wav2vec2 import normalize_wavs

            wavs = normalize_wavs(wavs, wav_lens)
        feat = ConvFeatureExtractor(
            DEFAULT_CONV_LAYERS, cfg.extractor_mode, False, self.dtype,
            name="feature_extractor",
        )(wavs)
        t_feat = feat.shape[1]
        r = max(wavs.shape[1] // max(t_feat, 1), 1)
        feat_lens = jnp.minimum(-(-wav_lens // r), t_feat)

        feat = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm")(feat)
        x = nn.Dense(cfg.encoder_embed_dim, dtype=self.dtype, name="post_extract_proj")(
            feat.astype(self.dtype)
        )
        pad = ~length_mask(feat_lens, t_feat)

        # pre encoder (full rate, pos conv)
        _, hs_pre = TransformerEncoder(
            embed_dim=cfg.encoder_embed_dim, ffn_dim=cfg.encoder_ffn_embed_dim,
            num_layers=cfg.pre_layers, num_heads=cfg.encoder_attention_heads,
            dropout=cfg.dropout, attention_dropout=cfg.attention_dropout,
            conv_pos=cfg.conv_pos, conv_pos_groups=cfg.conv_pos_groups,
            dtype=self.dtype, name="pre_encoder",
        )(x, pad, deterministic=deterministic)
        pre_out = hs_pre[-1]

        # downsample (strided conv), middle encoder at low rate
        low = nn.Conv(
            cfg.encoder_embed_dim, (cfg.ratio * 2,), strides=(cfg.ratio,),
            padding="SAME", dtype=self.dtype, name="downsampler",
        )(pre_out)
        low_lens = -(-feat_lens // cfg.ratio)
        low_pad = ~length_mask(low_lens, low.shape[1])
        _, hs_mid = _NoPosEncoder(cfg, cfg.middle_layers, self.dtype, name="middle_encoder")(
            low, low_pad, deterministic
        )
        mid_out = hs_mid[-1]

        # upsample back (transposed conv) + skip, post encoder
        up = nn.ConvTranspose(
            cfg.encoder_embed_dim, (cfg.ratio * 2,), strides=(cfg.ratio,),
            padding="SAME", dtype=self.dtype, name="upsampler",
        )(mid_out)[:, :t_feat]
        if up.shape[1] < t_feat:
            up = jnp.pad(up, ((0, 0), (0, t_feat - up.shape[1]), (0, 0)))
        y = up + pre_out  # residual skip across the hourglass
        _, hs_post = _NoPosEncoder(cfg, cfg.post_layers, self.dtype, name="post_encoder")(
            y, pad, deterministic
        )

        # middle states upsampled to full rate (see module docstring)
        hs_mid_full = jnp.repeat(hs_mid, cfg.ratio, axis=2)[:, :, :t_feat]
        hidden_states = jnp.concatenate([hs_pre, hs_mid_full, hs_post], axis=0)
        return hidden_states, feat_lens


class _NoPosEncoder(nn.Module):
    """Transformer stack without the conv positional embedding (the middle/
    post encoders reuse positions carried by the features)."""

    cfg: MultiresHubertConfig
    layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_padding_mask, deterministic=True):
        from .transformer import EncoderLayer

        cfg = self.cfg
        if key_padding_mask is not None:
            x = jnp.where(key_padding_mask[..., None], 0.0, x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm")(x).astype(self.dtype)

        def body(layer, carry, _):
            return layer(carry, key_padding_mask, None, deterministic), carry

        scan = nn.scan(
            body, variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True}, length=self.layers,
        )
        layer = EncoderLayer(
            cfg.encoder_embed_dim, cfg.encoder_ffn_embed_dim,
            cfg.encoder_attention_heads, False, cfg.dropout, 0.0,
            cfg.attention_dropout, "gelu", self.dtype, name="layers",
        )
        x, inputs = scan(layer, x, None)
        return x, jnp.concatenate([inputs, x[None]], axis=0)
