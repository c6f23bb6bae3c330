"""WavLM — gated relative-position-bias transformer on the wav2vec2 trunk.

Behavioral spec from the vendored Microsoft WavLM in the reference
(s3prl/upstream/wavlm/WavLM.py:162-248 config, 532-660 encoder;
modules.py:417-463 bucketed relative bias, modules.py:532-556 GRU-style
gating): identical conv extractor + conv-pos-emb transformer as wav2vec2,
plus
- a T5-style bucketed relative position bias (num_buckets=320,
  max_distance=800) owned by the FIRST layer and shared by all layers;
- per-layer "gru_rel_pos" gating: a gate computed from the layer's raw
  input (per head) rescales the shared bias per query position.

TPU-first rendering:
- the bucket index matrix is a static [T, T] constant folded at trace time
  (pure function of shapes) — the bias lookup is one embedding gather + the
  gate a tiny per-layer matmul, all fused by XLA into the attention;
- the shared bias lives at the encoder level (the reference stores it inside
  layer 0; conversion maps it up) so the scanned layers stay homogeneous.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .convfe import ConvFeatureExtractor
from .transformer import ConvPositionalEmbedding, SelfAttention
from .wav2vec2 import Wav2Vec2Config, normalize_wavs
from ..ops.masking import length_mask


@dataclass(frozen=True)
class WavLMConfig(Wav2Vec2Config):
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = True


WAVLM_BASE = WavLMConfig(dropout_input=0.0)
WAVLM_BASE_PLUS = WAVLM_BASE
WAVLM_LARGE = WavLMConfig(
    extractor_mode="layer_norm",
    encoder_layers=24,
    encoder_embed_dim=1024,
    encoder_ffn_embed_dim=4096,
    encoder_attention_heads=16,
    layer_norm_first=True,
    dropout=0.0,
    attention_dropout=0.0,
    dropout_input=0.0,
    normalize=True,
)


@lru_cache(maxsize=16)
def relative_position_buckets(
    seq_len: int, num_buckets: int = 320, max_distance: int = 800
) -> np.ndarray:
    """Static [T, T] bucket indices (reference: modules.py:417-443,
    bidirectional T5 bucketing: half sign, half log-spaced magnitude)."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets


class GatedRelPosLayer(nn.Module):
    """WavLM transformer block: standard pre/post-LN layer whose attention
    adds the shared rel-pos bias, per-query rescaled by a learned gate
    (reference: modules.py:532-556)."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    layer_norm_first: bool = False
    dropout: float = 0.1
    activation_dropout: float = 0.0
    attention_dropout: float = 0.1
    activation: str = "gelu"
    gru_rel_pos: bool = True
    use_flash: bool = False  # Pallas gated-bias attention (forward-only)
    quantize: bool = False  # int8 W8A8 projections (serving)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, C]
        key_padding_mask: Optional[jnp.ndarray],
        position_bias: Optional[jnp.ndarray],  # [H, T, T] shared across layers
        deterministic: bool = True,
    ) -> jnp.ndarray:
        from .transformer import _fused_block_available

        B, T, C = x.shape
        H = self.num_heads
        Dh = C // H

        def gate_of(h):
            """Per-(head, query) bias gate (reference: modules.py:536-546).
            Gate input is the layer's raw input split by heads (NOT the q
            projection)."""
            q_heads = h.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
            g = nn.Dense(8, dtype=self.dtype, name="grep_linear")(q_heads)
            g = jax.nn.sigmoid(g.reshape(B, H, T, 2, 4).sum(-1))  # [B,H,T,2]
            gate_a, gate_b = g[..., 0:1], g[..., 1:2]  # [B,H,T,1]
            grep_a = self.param("grep_a", nn.initializers.ones, (1, H, 1, 1), jnp.float32)
            gate = gate_a * (gate_b * grep_a.astype(g.dtype) - 1.0) + 2.0
            return gate[..., 0]  # [B, H, T]

        def attn(h):
            mod = SelfAttention(
                self.embed_dim, self.num_heads, self.attention_dropout,
                self.dtype, use_flash=self.use_flash, quantize=self.quantize,
                name="self_attn",
            )
            if position_bias is None:
                return mod(h, key_padding_mask, None, deterministic)
            if self.gru_rel_pos:
                return mod(h, key_padding_mask, None, deterministic,
                           rel_bias=(position_bias, gate_of(h)))
            return mod(h, key_padding_mask, position_bias[None], deterministic)

        def fused_gated_attn(h, residual):
            """Gated-bias MHA + int8 out-proj + residual in one kernel
            (kernels/flash_attention.py gated_bias_attention_outproj) —
            the raw attention output and the [B,H,T,T] gated-bias product
            never exist in HBM. Same param tree as the unfused path.
            On-chip A/B (v5e, B=32/10 s serving protocol): the kernel
            VMEM-OOMs at its natural BQ=256 tiling (25 MB scoped vs 16 MB)
            and at the largest fitting tile (S3PRL_BQ=64) measures 2,518
            audio-sec/s vs 2,564 for the split gated-MHA + int8-out-proj
            pair — so the SPLIT path is the serving default and this
            kernel is opt-in (S3PRL_WAVLM_FUSE=1 + S3PRL_BQ<=64) for
            chips with larger scoped-VMEM budgets."""
            from ..kernels.flash_attention import gated_bias_attention_outproj
            from ..ops.quant import cached_quantize_cols, int8_matmul
            from .transformer import _AttnProjParams

            (kq, bq), (ko, bo) = _AttnProjParams(
                self.embed_dim, name="self_attn")()
            kq = cached_quantize_cols(self, "qkv_q8", kq)
            ko = cached_quantize_cols(self, "out_proj_q8", ko)
            qkv = int8_matmul(h, kq, bq, out_dtype=self.dtype)
            kv_lens = (
                (~key_padding_mask).sum(-1).astype(jnp.int32)
                if key_padding_mask is not None
                else jnp.full((B,), T, jnp.int32)
            )
            return gated_bias_attention_outproj(
                qkv, residual, position_bias, gate_of(h), ko, bo, kv_lens, H
            )

        import os

        fuse_gated = (
            self.quantize and deterministic and self.use_flash
            and self.gru_rel_pos and position_bias is not None
            and _fused_block_available()
            and os.environ.get("S3PRL_WAVLM_FUSE", "0") == "1"
        )

        ln_attn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="self_attn_layer_norm")
        drop = lambda h: nn.Dropout(self.dropout)(h, deterministic=deterministic)
        drop_act = lambda h: nn.Dropout(self.activation_dropout)(h, deterministic=deterministic)
        quant_serving = (
            self.quantize and deterministic and self.activation == "gelu"
            and _fused_block_available()
        )

        def ffn(h):
            from ..ops.quant import dense

            if quant_serving:
                from ..kernels.ffn import fused_int8_ffn
                from ..ops.quant import LinearParams

                from ..ops.quant import cached_quantize_cols

                k1, b1 = LinearParams(self.embed_dim, self.ffn_dim, name="fc1")()
                k2, b2 = LinearParams(self.ffn_dim, self.embed_dim, name="fc2")()
                return fused_int8_ffn(h, cached_quantize_cols(self, "fc1_q8", k1),
                                      b1, cached_quantize_cols(self, "fc2_q8", k2),
                                      b2)
            h = nn.gelu(dense(self.ffn_dim, quantize=self.quantize,
                              dtype=self.dtype, name="fc1")(h), approximate=False)
            h = drop_act(h)
            return dense(self.embed_dim, quantize=self.quantize,
                         dtype=self.dtype, name="fc2")(h)

        if self.layer_norm_first:
            if fuse_gated:
                x = fused_gated_attn(ln_attn(x).astype(self.dtype), x)
            else:
                x = x + drop(attn(ln_attn(x).astype(self.dtype)))
            if quant_serving:
                from ..kernels.ffn import fused_int8_ffn
                from ..ops.quant import (LinearParams, NormParams,
                                         cached_quantize_cols)

                g, be = NormParams(self.embed_dim, name="final_layer_norm")()
                k1, b1 = LinearParams(self.embed_dim, self.ffn_dim, name="fc1")()
                k2, b2 = LinearParams(self.ffn_dim, self.embed_dim, name="fc2")()
                x = fused_int8_ffn(x, cached_quantize_cols(self, "fc1_q8", k1),
                                   b1, cached_quantize_cols(self, "fc2_q8", k2),
                                   b2, ln=(g, be), residual=True)
            else:
                ln_final = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                        name="final_layer_norm")
                x = x + drop(ffn(ln_final(x).astype(self.dtype)))
        else:
            ln_final = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_layer_norm")
            if fuse_gated:
                x = ln_attn(fused_gated_attn(x, x)).astype(self.dtype)
            else:
                x = ln_attn(x + drop(attn(x))).astype(self.dtype)
            x = ln_final(x + drop(ffn(x))).astype(self.dtype)
        return x


class WavLMModel(nn.Module):
    """Full WavLM: conv features -> LN -> proj -> gated rel-pos transformer.

    Returns (hidden_states[L+1, B, T', C], feat_lens[B]) with the same
    hook-layout capture as the other trunks (wavlm/expert.py uses the same
    per-layer-input hooks as hubert)."""

    cfg: WavLMConfig = WAVLM_BASE
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_flash: bool = False  # Pallas gated-bias attention (serving)
    quantize: bool = False  # int8 W8A8 projections (serving)

    @nn.compact
    def __call__(
        self,
        wavs: jnp.ndarray,
        wav_lens: jnp.ndarray,
        mask_indices: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        if cfg.normalize:
            wavs = normalize_wavs(wavs, wav_lens)
        features = ConvFeatureExtractor(
            cfg.conv_feature_layers, cfg.extractor_mode, cfg.conv_bias, self.dtype,
            name="feature_extractor",
        )(wavs, train=not deterministic)
        t_feat = features.shape[1]
        r = max(wavs.shape[1] // max(t_feat, 1), 1)
        feat_lens = jnp.minimum(-(-wav_lens // r), t_feat)

        features = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm")(features)
        features = features.astype(self.dtype)
        if cfg.conv_feature_layers[-1][0] != cfg.encoder_embed_dim:
            features = nn.Dense(cfg.encoder_embed_dim, dtype=self.dtype, name="post_extract_proj")(features)
        features = nn.Dropout(cfg.dropout_input)(features, deterministic=deterministic)

        mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(scale=1.0),
            (cfg.encoder_embed_dim,), jnp.float32,
        )
        if mask_indices is not None:
            features = jnp.where(mask_indices[..., None], mask_emb.astype(self.dtype), features)

        padding_mask = ~length_mask(feat_lens, t_feat)
        x = jnp.where(padding_mask[..., None], 0.0, features)
        x = x + ConvPositionalEmbedding(
            cfg.encoder_embed_dim, cfg.conv_pos, cfg.conv_pos_groups,
            dtype=self.dtype, name="pos_conv",
        )(x)
        if not cfg.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="enc_layer_norm")(x).astype(self.dtype)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        # shared relative position bias (owned by layer 0 in the reference;
        # stored at encoder level here so scanned layers stay homogeneous)
        if cfg.relative_position_embedding:
            rel_emb = self.param(
                "relative_attention_bias",
                nn.initializers.normal(0.02),
                (cfg.num_buckets, cfg.encoder_attention_heads),
                jnp.float32,
            )
            buckets = jnp.asarray(
                relative_position_buckets(t_feat, cfg.num_buckets, cfg.max_distance)
            )
            position_bias = jnp.transpose(rel_emb[buckets], (2, 0, 1))  # [H,T,T]
            position_bias = position_bias.astype(self.dtype)
        else:
            position_bias = None

        def body(layer, carry, _):
            h = layer(carry, padding_mask, position_bias, deterministic)
            return h, carry

        scan = nn.scan(
            body,
            variable_axes={"params": 0, "qcache": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.encoder_layers,
        )
        layer = GatedRelPosLayer(
            cfg.encoder_embed_dim, cfg.encoder_ffn_embed_dim,
            cfg.encoder_attention_heads, cfg.layer_norm_first,
            cfg.dropout, cfg.activation_dropout, cfg.attention_dropout,
            cfg.activation_fn, cfg.gru_rel_pos, use_flash=self.use_flash,
            quantize=self.quantize, dtype=self.dtype, name="layers",
        )
        x, layer_inputs = scan(layer, x, None)
        if cfg.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="enc_layer_norm")(x).astype(self.dtype)
        hidden_states = jnp.concatenate([layer_inputs, x[None]], axis=0)
        return hidden_states, feat_lens
