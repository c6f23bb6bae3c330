"""Modified CPC (FAIR) — conv encoder + autoregressive GRU/LSTM context.

Behavioral spec from the reference (s3prl/upstream/cpc/model.py:
CPCEncoder:62 — five padded strided convs (10/5, 8/4, 4/2 x3 = stride 160,
256-d, ChannelNorm + ReLU), gAR = recurrent context network; the expert
exposes two hidden states: encoder output z and AR output c
(cpc/expert.py:24-31).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class CPCConfig:
    hidden_size: int = 256
    ar_size: int = 256
    ar_layers: int = 1


class ChannelNorm(nn.Module):
    """Per-time LayerNorm over channels (reference: cpc/model.py:33-59)."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, name="ln")(x)


class CPCModel(nn.Module):
    cfg: CPCConfig = CPCConfig()

    @nn.compact
    def __call__(self, wavs: jnp.ndarray, wav_lens: jnp.ndarray, train: bool = False):
        """Returns (hidden_states[2, B, T', H], feat_lens)."""
        h = self.cfg.hidden_size
        x = wavs[..., None]
        specs = [(10, 5, 3), (8, 4, 2), (4, 2, 1), (4, 2, 1), (4, 2, 1)]
        lens = wav_lens
        for i, (k, s, p) in enumerate(specs):
            x = nn.Conv(h, (k,), strides=(s,), padding=((p, p),), name=f"conv_{i}")(x)
            x = ChannelNorm(name=f"norm_{i}")(x)
            x = nn.relu(x)
            lens = (lens + 2 * p - k) // s + 1
        z = x
        c = x
        for i in range(self.cfg.ar_layers):
            c = nn.RNN(nn.GRUCell(self.cfg.ar_size), name=f"gru_{i}")(c, seq_lengths=lens)
        if z.shape[-1] == c.shape[-1]:
            hs = jnp.stack([z, c])
        else:
            hs = jnp.stack([nn.Dense(c.shape[-1], name="z_proj")(z), c])
        return hs, lens
