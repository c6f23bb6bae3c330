"""Modified CPC (FAIR) — conv encoder + autoregressive GRU/LSTM context.

Behavioral spec from the reference (s3prl/upstream/cpc/model.py:
CPCEncoder:62 — five padded strided convs (10/5 p3, 8/4 p2, 4/2 p1 x3 =
stride 160, ChannelNorm + ReLU), CPCAR:152 — torch GRU/LSTM/RNN stack; the
expert exposes two hidden states: encoder output z and AR output c
(cpc/expert.py:24-31). Checkpoints store {"config", "weights"}
(cpc/expert.py:27-34) with the architecture selected by the config
(cpc_default_config.py: hiddenEncoder/hiddenGar/arMode/nLevelsGRU).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CPCConfig:
    hidden_size: int = 256  # hiddenEncoder
    ar_size: int = 256  # hiddenGar
    ar_layers: int = 1  # nLevelsGRU
    ar_mode: str = "lstm"  # arMode default (cpc_default_config.py:141-146)


class ChannelNorm(nn.Module):
    """Per-time norm over channels with torch's *unbiased* variance
    (reference: cpc/model.py:33-59 uses x.var(dim=1), unbiased by default,
    so plain LayerNorm is off by sqrt(C/(C-1)))."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True) * (C / max(C - 1, 1))
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return y * scale + bias


class CPCModel(nn.Module):
    cfg: CPCConfig = CPCConfig()

    @nn.compact
    def __call__(self, wavs: jnp.ndarray, wav_lens: jnp.ndarray, train: bool = False):
        """Returns (hidden_states[2, B, T', H], feat_lens)."""
        cfg = self.cfg
        h = cfg.hidden_size
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
        for i in range(cfg.ar_layers):
            if cfg.ar_mode == "lstm":
                cell = nn.OptimizedLSTMCell(cfg.ar_size, name=f"ar_{i}")
            elif cfg.ar_mode == "rnn":
                cell = nn.SimpleCell(cfg.ar_size, activation_fn=jnp.tanh, name=f"ar_{i}")
            else:
                cell = nn.GRUCell(cfg.ar_size, name=f"ar_{i}")
            c = nn.RNN(cell)(c, seq_lengths=lens)
        if z.shape[-1] == c.shape[-1]:
            hs = jnp.stack([z, c])
        else:
            hs = jnp.stack([nn.Dense(c.shape[-1], name="z_proj")(z), c])
        return hs, lens
