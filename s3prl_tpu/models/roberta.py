"""RoBERTa-style discrete-unit language model (fairseq semantics).

Behavioral spec from the reference (s3prl/upstream/roberta/roberta_model.py —
a fairseq-free RoBERTa consumed by the `vq_wav2vec_kmeans_roberta` pipeline:
vq-wav2vec discretizes audio to "g0-g1" code strings, a fairseq Dictionary
maps them to ids wrapped in <s> ... </s>, RoBERTa contextualizes them).

fairseq details replicated exactly (base_architecture:1599-1641,
TransformerEncoder:1896-1990):
- learned positions with the padding offset: position ids are
  cumsum(valid)*valid + padding_idx (make_positions:100-110), so the first
  valid token gets padding_idx+1 and pads get padding_idx;
- no embedding scale (no_scale_embedding=True), layernorm_embedding, post-LN
  blocks, GELU;
- hidden states = [embedding output] + every layer output (the expert's
  return_all_hiddens inner_states).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from .transformer import EncoderLayer
from ..ops.masking import length_mask


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 320 * 320 + 5  # vq code pairs + specials + <mask>
    max_positions: int = 512  # max_source_positions (excl. pad offset)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_size: int = 3072
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    pad_idx: int = 1  # fairseq Dictionary: <s>=0 <pad>=1 </s>=2 <unk>=3


class RobertaModel(nn.Module):
    cfg: RobertaConfig = RobertaConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lens: jnp.ndarray, deterministic=True):
        """tokens[B, T] int ids -> (hidden_states[L+1, B, T, H], lens)."""
        cfg = self.cfg
        B, T = tokens.shape
        valid = length_mask(lens, T).astype(jnp.int32)
        tokens = jnp.where(valid > 0, tokens, cfg.pad_idx)
        pos_ids = jnp.cumsum(valid, axis=1) * valid + cfg.pad_idx
        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="embed_tokens")(tokens)
        # fairseq zeroes the pad row of the token embedding; replicate for
        # random init too (converted ckpts carry the zero row already)
        emb = jnp.where(valid[..., None] > 0, emb, 0.0)
        pos = nn.Embed(
            cfg.max_positions + cfg.pad_idx + 1, cfg.hidden_size,
            name="embed_positions",
        )(pos_ids)
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
                activation_dropout=cfg.activation_dropout,
                attention_dropout=cfg.attention_dropout,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, pad, None, deterministic)
            hidden.append(x)
        return jnp.stack(hidden), lens
