"""Transformer decoder (causal self-attention + cross-attention).

Used by the speech translation task (reference: s3prl/downstream/
speech_translation — a fairseq S2T transformer; here a first-party
encoder-decoder with the same shape: token embedding + sinusoid positions,
post-LN blocks, tied output projection optional).
"""

from __future__ import annotations

from dataclasses import dataclass
import flax.linen as nn
import jax.numpy as jnp

from .mockingjay import sinusoid_table
from ..ops.attention import scaled_dot_attention
from ..ops.masking import length_mask


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 1000
    hidden_size: int = 256
    num_layers: int = 3
    num_heads: int = 4
    ffn_size: int = 1024
    dropout: float = 0.1
    max_positions: int = 1024


class _CrossAttention(nn.Module):
    hidden: int
    heads: int

    @nn.compact
    def __call__(self, q_in, kv, kv_pad_mask, causal=False):
        B, Tq, C = q_in.shape
        Tk = kv.shape[1]
        H, Dh = self.heads, C // self.heads
        q = nn.Dense(C, name="q")(q_in).reshape(B, Tq, H, Dh).transpose(0, 2, 1, 3)
        k = nn.Dense(C, name="k")(kv).reshape(B, Tk, H, Dh).transpose(0, 2, 1, 3)
        v = nn.Dense(C, name="v")(kv).reshape(B, Tk, H, Dh).transpose(0, 2, 1, 3)
        bias = None
        if causal:
            causal_mask = jnp.tril(jnp.ones((Tq, Tk), bool))
            bias = jnp.where(causal_mask, 0.0, -1e9)[None, None]
        out = scaled_dot_attention(q * (Dh ** -0.5), k, v, kv_pad_mask, bias)
        return nn.Dense(C, name="out")(out.transpose(0, 2, 1, 3).reshape(B, Tq, C))


class TransformerDecoder(nn.Module):
    cfg: DecoderConfig = DecoderConfig()

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,  # [B, Tq] target ids (teacher forcing input)
        memory: jnp.ndarray,  # [B, Tk, H] encoder states
        memory_lens: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        B, Tq = tokens.shape
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="embed")(tokens)
        x = x + jnp.asarray(sinusoid_table(Tq, cfg.hidden_size))[None]
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        mem_pad = ~length_mask(memory_lens, memory.shape[1])
        if memory.shape[-1] != cfg.hidden_size:
            memory = nn.Dense(cfg.hidden_size, name="memory_proj")(memory)
        # sinusoid positions on the memory too — the fairseq S2T encoder the
        # reference wraps applies positional embeddings to encoder states
        # (fairseq s2t_transformer.py); without them cross-attention can
        # address the memory only by content (caught by the ST convergence
        # run: a tone-order task plateaued because identical tones at
        # different positions were indistinguishable)
        memory = memory + jnp.asarray(
            sinusoid_table(memory.shape[1], cfg.hidden_size)
        )[None].astype(memory.dtype)
        for i in range(cfg.num_layers):
            h = _CrossAttention(cfg.hidden_size, cfg.num_heads, name=f"self_{i}")(
                x, x, None, causal=True
            )
            x = nn.LayerNorm(epsilon=1e-5, name=f"ln_self_{i}")(x + h)
            h = _CrossAttention(cfg.hidden_size, cfg.num_heads, name=f"cross_{i}")(
                x, memory, mem_pad
            )
            x = nn.LayerNorm(epsilon=1e-5, name=f"ln_cross_{i}")(x + h)
            h = nn.Dense(cfg.ffn_size, name=f"fc1_{i}")(x)
            h = nn.Dense(cfg.hidden_size, name=f"fc2_{i}")(nn.gelu(h, approximate=False))
            x = nn.LayerNorm(epsilon=1e-5, name=f"ln_ffn_{i}")(x + h)
        return nn.Dense(cfg.vocab_size, name="output")(x)
