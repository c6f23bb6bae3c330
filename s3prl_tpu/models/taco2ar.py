"""Taco2-AR voice-conversion decoder.

Behavioral spec from the reference VC recipes (s3prl/downstream/
a2o-vc-vcc2020, a2a-vc-vctk — Tacotron2-style autoregressive decoders over
frame-aligned upstream features): prenet over the previous mel frame, a
2-layer LSTM consuming [feature_t, prenet(mel_{t-1})] (plus an optional
speaker embedding for any-to-any), a linear mel projection, and a conv
postnet residual. Teacher forcing trains in one pass; inference feeds
predictions back through a lax.scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class Taco2ARConfig:
    mel_dim: int = 80
    prenet_units: int = 256
    lstm_units: int = 512
    num_lstm_layers: int = 2
    spk_embed_dim: int = 0  # >0 enables any-to-any conditioning
    postnet_channels: int = 256
    postnet_kernel: int = 5
    postnet_layers: int = 3


class _Prenet(nn.Module):
    units: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.relu(nn.Dense(self.units, name=f"fc{i}")(x))
            # tacotron prenet keeps dropout on at inference as well
            x = nn.Dropout(0.5)(x, deterministic=False, rng=self.make_rng("prenet"))
        return x


class Taco2ARDecoder(nn.Module):
    cfg: Taco2ARConfig = Taco2ARConfig()

    def _postnet(self, mel):
        x = mel
        for i in range(self.cfg.postnet_layers):
            out_ch = self.cfg.mel_dim if i == self.cfg.postnet_layers - 1 else self.cfg.postnet_channels
            x = nn.Conv(out_ch, (self.cfg.postnet_kernel,), padding="SAME", name=f"postnet_{i}")(x)
            if i < self.cfg.postnet_layers - 1:
                x = nn.tanh(x)
        return mel + x

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,  # [B, T, H] frame-aligned upstream features
        prev_mels: jnp.ndarray,  # [B, T, mel] teacher-forcing inputs (shifted)
        spk_embed: Optional[jnp.ndarray] = None,  # [B, spk_embed_dim]
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        p = _Prenet(cfg.prenet_units, name="prenet")(prev_mels, train)
        x = jnp.concatenate([features, p], axis=-1)
        if cfg.spk_embed_dim and spk_embed is not None:
            spk = jnp.broadcast_to(
                spk_embed[:, None, :], (x.shape[0], x.shape[1], spk_embed.shape[-1])
            )
            x = jnp.concatenate([x, spk], axis=-1)
        for i in range(cfg.num_lstm_layers):
            x = nn.RNN(nn.OptimizedLSTMCell(cfg.lstm_units), name=f"lstm_{i}")(x)
        mel = nn.Dense(cfg.mel_dim, name="mel_out")(x)
        return self._postnet(mel)
