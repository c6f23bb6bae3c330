"""DeCoAR 2.0 — fbank transformer (reference: s3prl/upstream/decoar2/
decoar2.py): kaldi fbank-80 -> Dense(768) -> 12-layer post-LN conv-pos
transformer; hidden states follow the standard layer-inputs + final layout
(the decoar2 expert hooks encoder layers like hubert)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .transformer import TransformerEncoder
from ..ops.masking import length_mask


class Decoar2Model(nn.Module):
    dtype: jnp.dtype = jnp.float32
    num_layers: int = 12  # the reference default (decoar2.py:12); factories
    # size this from the checkpoint's actual layer count when loading

    @nn.compact
    def __call__(self, feats, feat_lens, deterministic=True):
        x = nn.Dense(768, dtype=self.dtype, name="post_extract_proj")(feats)
        x = nn.Dropout(0.1)(x, deterministic=deterministic)
        pad = ~length_mask(feat_lens, x.shape[1])
        _, hs = TransformerEncoder(
            embed_dim=768, ffn_dim=3072, num_layers=self.num_layers, num_heads=12,
            layer_norm_first=False, dropout=0.1, attention_dropout=0.1,
            dtype=self.dtype, name="encoder",
        )(x, pad, deterministic=deterministic)
        return hs, feat_lens
