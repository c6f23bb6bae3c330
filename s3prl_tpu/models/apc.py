"""APC / VQ-APC — autoregressive predictive coding over mel features.

Behavioral spec from the reference (s3prl/upstream/apc/apc.py:26-160,
vq.py:29-90): a stack of unidirectional GRUs (dropout between layers,
optional residual), an optional grouped Gumbel-softmax VQ layer on the last
hidden states, and a linear postnet regressing the input features
`n_future` frames ahead. Hidden states exposed to SUPERB are every RNN
layer's outputs [N, B, T, H].

TPU note: unidirectional GRUs lower to lax.scan — sequential over time by
nature; APC models are small (3x512) so this stays fast. Masked lengths are
respected via nn.RNN's seq_lengths (the reference packs sequences).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class APCConfig:
    input_size: int = 80  # log-mel
    hidden_size: int = 512
    num_layers: int = 3
    dropout: float = 0.1
    residual: bool = True
    # VQ (VQ-APC) — None disables
    vq_codebook_size: Optional[Tuple[int, ...]] = None  # e.g. (512,)
    vq_code_dim: Optional[Tuple[int, ...]] = None  # e.g. (512,)
    vq_gumbel_temperature: float = 0.5


class VQLayer(nn.Module):
    """Gumbel-softmax vector quantizer (reference: apc/vq.py:29-90)."""

    codebook_size: int
    code_dim: int
    gumbel_temperature: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        logits = nn.Dense(self.codebook_size, name="vq_logits")(x)
        codebook = self.param(
            "codebook",
            nn.initializers.lecun_normal(),
            (self.codebook_size, self.code_dim),
        )
        if train:
            key = self.make_rng("gumbel")
            g = jax.random.gumbel(key, logits.shape, logits.dtype)
            y_soft = jax.nn.softmax((logits + g) / self.gumbel_temperature, axis=-1)
            idx = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(idx, self.codebook_size, dtype=logits.dtype)
            onehot = y_hard + y_soft - jax.lax.stop_gradient(y_soft)  # straight-through
        else:
            idx = jnp.argmax(logits, axis=-1)
            onehot = jax.nn.one_hot(idx, self.codebook_size, dtype=logits.dtype)
        return logits, onehot @ codebook


class APCModel(nn.Module):
    cfg: APCConfig = APCConfig()

    @nn.compact
    def __call__(self, feats: jnp.ndarray, feat_lens: jnp.ndarray, train: bool = False):
        """Returns (hiddens[N, B, T, H], predicted[B, T, M], feat_lens)."""
        cfg = self.cfg
        x = feats
        hiddens = []
        for i in range(cfg.num_layers):
            rnn = nn.RNN(nn.GRUCell(cfg.hidden_size, name=f"cell_{i}"))
            out = rnn(x, seq_lengths=feat_lens)
            # reference order (apc.py:121-141): dropout every layer, residual
            # only from the second layer on
            out = nn.Dropout(cfg.dropout)(out, deterministic=not train)
            if cfg.residual and i > 0 and x.shape[-1] == out.shape[-1]:
                out = out + x
            hiddens.append(out)
            x = out

        if cfg.vq_codebook_size:
            parts = []
            offset = 0
            for g, (cs, cd) in enumerate(zip(cfg.vq_codebook_size, cfg.vq_code_dim)):
                _, q = VQLayer(cs, cd, cfg.vq_gumbel_temperature, name=f"vq_{g}")(
                    x[..., offset : offset + cd], train=train
                )
                parts.append(q)
                offset += cd
            x = jnp.concatenate(parts, axis=-1)

        predicted = nn.Dense(cfg.input_size, name="postnet")(x)
        return jnp.stack(hiddens), predicted, feat_lens
