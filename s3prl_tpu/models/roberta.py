"""RoBERTa-style discrete-unit language model.

Behavioral spec from the reference (s3prl/upstream/roberta/roberta_model.py
— a fairseq-free RoBERTa consumed by the `vq_wav2vec_kmeans_roberta`
pipeline: vq-wav2vec discretizes audio to unit ids, RoBERTa contextualizes
them): token embedding + learned positions + post-LN transformer (BERT
block, eps 1e-5), hidden states per layer.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from .transformer import EncoderLayer
from ..ops.masking import length_mask


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 320 * 2 + 4  # vq-wav2vec groups + specials
    max_positions: int = 2048
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_size: int = 3072
    dropout: float = 0.1


class RobertaModel(nn.Module):
    cfg: RobertaConfig = RobertaConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lens: jnp.ndarray, deterministic=True):
        """tokens[B, T] int ids -> (hidden_states[L+1, B, T, H], lens)."""
        cfg = self.cfg
        B, T = tokens.shape
        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="embed_tokens")(tokens)
        pos = nn.Embed(cfg.max_positions, cfg.hidden_size, name="embed_positions")(
            jnp.arange(T)[None]
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="emb_layer_norm")(
            emb + pos
        ).astype(self.dtype)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        pad = ~length_mask(lens, T)

        hidden = [x]
        for i in range(cfg.num_layers):
            x = EncoderLayer(
                cfg.hidden_size, cfg.ffn_size, cfg.num_heads,
                layer_norm_first=False, dropout=cfg.dropout,
                attention_dropout=cfg.dropout, dtype=self.dtype, name=f"layer_{i}",
            )(x, pad, None, deterministic)
            hidden.append(x)
        return jnp.stack(hidden), lens
