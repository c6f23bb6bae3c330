"""Mockingjay / TERA / AudioALBERT — BERT-style mel-domain SSL encoders.

Behavioral spec from the reference (s3prl/upstream/mockingjay/model.py:
TransformerConfig:25, TransformerModel:435, TransformerSpecPredictionHead:389;
sinusoid table builder.py:469-514; configs pretrain/{mockingjay,tera,
audio_albert}/config_model.yaml): post-LN BERT blocks (eps 1e-12) over
acoustic features (fbank+deltas+CMVN for mockingjay, log-mel for TERA) with
additive sinusoidal position encodings on the input projection; AudioALBERT
shares one layer's weights across all blocks.

TPU-first: the sinusoid table is a static trace-time constant; layers run
under nn.scan — per-layer stacked params normally, or a single broadcast
param set when `share_layer=True` (ALBERT sharing falls out of the scan
axis choice for free).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.attention import scaled_dot_attention
from ..ops.masking import length_mask


@dataclass(frozen=True)
class MockingjayConfig:
    input_dim: int = 240  # fbank80 + delta2 (mockingjay); 80 for TERA mel
    hidden_size: int = 768
    num_hidden_layers: int = 3
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    share_layer: bool = False  # True = AudioALBERT
    pre_layer_norm: bool = False
    downsample_rate: int = 1  # consecutive-frame stacking factor


@lru_cache(maxsize=8)
def sinusoid_table(max_len: int, hidden_size: int) -> np.ndarray:
    """Sinusoidal position table (reference: builder.py:469-484)."""
    pos = np.arange(max_len)[:, None]
    dim = np.arange(hidden_size)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / hidden_size)
    table = np.zeros((max_len, hidden_size), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class BertLayer(nn.Module):
    """Post-LN (or optional pre-LN) BERT block (reference: model.py:126-331)."""

    cfg: MockingjayConfig
    dtype: jnp.dtype = jnp.float32

    def _act(self, x):
        return {"gelu": lambda v: nn.gelu(v, approximate=False), "relu": nn.relu, "swish": nn.silu}[
            self.cfg.hidden_act
        ](x)

    @nn.compact
    def __call__(self, x, key_padding_mask, deterministic: bool = True):
        cfg = self.cfg
        B, T, C = x.shape
        H = cfg.num_attention_heads
        Dh = C // H
        eps = cfg.layer_norm_eps

        def attention(h):
            q = nn.Dense(C, dtype=self.dtype, name="query")(h)
            k = nn.Dense(C, dtype=self.dtype, name="key")(h)
            v = nn.Dense(C, dtype=self.dtype, name="value")(h)
            q = q.reshape(B, T, H, Dh).transpose(0, 2, 1, 3) * (Dh ** -0.5)
            k = k.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
            v = v.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
            out = scaled_dot_attention(q, k, v, key_padding_mask)
            out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
            out = nn.Dense(C, dtype=self.dtype, name="attn_output")(out)
            return nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)

        def ffn(h):
            inner = self._act(nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(h))
            out = nn.Dense(C, dtype=self.dtype, name="output")(inner)
            return nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)

        ln_attn = nn.LayerNorm(epsilon=eps, dtype=jnp.float32, name="attn_layer_norm")
        ln_out = nn.LayerNorm(epsilon=eps, dtype=jnp.float32, name="out_layer_norm")
        if cfg.pre_layer_norm:
            x = x + attention(ln_attn(x).astype(self.dtype))
            x = x + ffn(ln_out(x).astype(self.dtype))
        else:
            x = ln_attn(x + attention(x)).astype(self.dtype)
            x = ln_out(x + ffn(x)).astype(self.dtype)
        return x


class MockingjayEncoder(nn.Module):
    """Input projection + sinusoid pos enc + N BERT blocks.

    Returns hidden_states[N+1, B, T, H] — layer inputs plus the final output
    (the reference appends hidden_states before every block and once after
    the loop, model.py:359-388: [input_repr, block1_out, ..., blockN_out]).
    """

    cfg: MockingjayConfig = MockingjayConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,  # [B, T, D] acoustic features
        feat_lens: jnp.ndarray,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        B, T, D = feats.shape
        dr = cfg.downsample_rate
        if dr > 1:  # consecutive-frame stacking (builder.py down_sample_frames)
            T2 = T // dr
            feats = feats[:, : T2 * dr].reshape(B, T2, D * dr)
            feat_lens = feat_lens // dr
            T = T2

        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="spec_transform")(feats)
        pos = jnp.asarray(sinusoid_table(T, cfg.hidden_size))[None]
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="input_layer_norm"
        )(x).astype(self.dtype)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)

        key_padding_mask = ~length_mask(feat_lens, T)

        def body(layer, carry, _):
            h = layer(carry, key_padding_mask, deterministic)
            return h, carry  # collect layer *inputs*; final appended below

        if cfg.share_layer:  # AudioALBERT: one param set broadcast over steps
            scan = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                length=cfg.num_hidden_layers,
            )
        else:
            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.num_hidden_layers,
            )
        layer = BertLayer(cfg, self.dtype, name="layers")
        x, layer_inputs = scan(layer, x, None)
        hidden_states = jnp.concatenate([layer_inputs, x[None]], axis=0)
        return hidden_states, feat_lens


class SpecPredictionHead(nn.Module):
    """Masked-spectrogram prediction head (reference: model.py:389-412)."""

    cfg: MockingjayConfig
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = {"gelu": lambda v: nn.gelu(v, approximate=False), "relu": nn.relu, "swish": nn.silu}[
            self.cfg.hidden_act
        ]
        x = act(nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="dense")(x))
        x = nn.LayerNorm(
            epsilon=self.cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm"
        )(x).astype(self.dtype)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="output")(x)
