"""Audio-event CNN encoders: VGGish and BYOL-A.

Behavioral spec from the reference:
- VGGish (s3prl/upstream/vggish/vggish.py): Google's VGG-style CNN over
  0.96 s log-mel patches (96 frames x 64 bins), 128-d embedding per patch;
  downsample rate = 0.96 s of audio per output frame.
- BYOL-A (s3prl/upstream/byol_a/byol_a.py): a light conv stack over log-mel
  (64 bins) followed by temporal pooling to per-frame embeddings (2048-d
  default), 10 ms hop inputs aggregated by the conv strides.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from ..ops import audio as audio_ops


class VGGishCNN(nn.Module):
    """[B, P, 96, 64] patches -> [B, P, 128] embeddings."""

    @nn.compact
    def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
        B, P, F, M = patches.shape
        x = patches.reshape(B * P, F, M, 1)
        for i, (features, reps) in enumerate([(64, 1), (128, 1), (256, 2), (512, 2)]):
            for r in range(reps):
                x = nn.relu(nn.Conv(features, (3, 3), padding="SAME", name=f"conv{i}_{r}")(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(B * P, -1)
        x = nn.relu(nn.Dense(4096, name="fc1_1")(x))
        x = nn.relu(nn.Dense(4096, name="fc1_2")(x))
        x = nn.relu(nn.Dense(128, name="fc2")(x))
        return x.reshape(B, P, 128)


def vggish_forward(model, params, wavs, wav_lens):
    """wav -> 96-frame log-mel patches -> embeddings; stride 0.96 s."""
    mel, mel_lens = audio_ops.log_mel(wavs, wav_lens, n_mels=64)
    T = mel.shape[1]
    P = max(T // 96, 1)
    patches = mel[:, : P * 96].reshape(mel.shape[0], P, 96, 64)
    emb = model.apply({"params": params}, patches)
    out_lens = jnp.maximum(mel_lens // 96, 1)
    return emb[None], out_lens  # [1, B, P, 128]


@dataclass(frozen=True)
class ByolAConfig:
    n_mels: int = 64
    feature_d: int = 2048


class ByolAEncoder(nn.Module):
    """[B, T, n_mels] log-mel -> [B, T//4, feature_d] (two 2x temporal pools)."""

    cfg: ByolAConfig = ByolAConfig()

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        B, T, M = mel.shape
        x = mel[..., None]  # [B, T, M, 1]
        for i in range(3):
            x = nn.relu(nn.BatchNorm(use_running_average=True, name=f"bn_{i}")(
                nn.Conv(64, (3, 3), padding="SAME", name=f"conv_{i}")(x)
            ))
            if i < 2:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        B2, T2, M2, C = x.shape
        x = x.reshape(B, T2, M2 * C)
        x = nn.relu(nn.Dense(self.cfg.feature_d, name="fc1")(x))
        x = nn.Dense(self.cfg.feature_d, name="fc2")(x)
        return x
