"""BYOL-A / BYOL-S — AudioNTT2020 CNN embeddings, native port.

Behavioral spec from the reference:
- the network (vendored twice: s3prl/upstream/byol_a/byol_a.py:89-140 and
  s3prl/upstream/byol_s/byol_a/models/audio_ntt.py): three Conv2d(3x3, pad 1)
  + BatchNorm + ReLU + MaxPool(2x2) blocks over the [mel, time] plane, then
  per-time-step MLP (Linear(64*n_mels/8 -> d), ReLU, Dropout, Linear(d, d),
  ReLU) and a temporal mean+amax summary per window;
- BYOL-A upstream (byol_a/expert.py:28-130): non-overlapping 1 s windows
  (stride_secs=1), log-MelSpectrogram (n_fft 1024, win 1024, hop 160,
  64 mels, 60-7800 Hz), fixed PrecomputedNorm stats (-5.4919195, 5.0389895);
- BYOL-S upstream (byol_s/serab_byols/serab.py:106-172, utils.py:50-101):
  1 s windows every 50 ms cut from a wav zero-padded by frame_size//2 /
  frame_size-frame_size//2, log-MelSpectrogram (win 400), and batch-computed
  norm stats with the reference's 1/N quirk (utils.py:40-47: mean and std
  are divided by the number of frames after reduction).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import audio as audio_ops

SAMPLE_RATE = 16000
EPS = float(np.finfo(np.float32).eps)


@dataclass(frozen=True)
class ByolConfig:
    n_mels: int = 64
    feature_d: int = 2048
    n_fft: int = 1024
    win_length: int = 1024  # byol_s uses 400
    hop_length: int = 160
    f_min: float = 60.0
    f_max: float = 7800.0
    window_secs: float = 1.0
    stride_secs: float = 1.0  # byol_s: 0.05
    # normalization: fixed stats (byol_a) or batch stats w/ 1/N quirk (byol_s)
    norm_stats: tuple = (-5.4919195, 5.0389895)
    batch_norm_stats: bool = False


BYOL_A_2048 = ByolConfig()
BYOL_A_1024 = ByolConfig(feature_d=1024)
BYOL_A_512 = ByolConfig(feature_d=512)
BYOL_S_DEFAULT = ByolConfig(
    win_length=400, stride_secs=0.05, batch_norm_stats=True
)


class AudioNTT2020(nn.Module):
    """[B, F(n_mels), T] normalized log-mel -> [B, d] (one window)."""

    n_mels: int = 64
    d: int = 2048

    @nn.compact
    def __call__(self, mel: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = mel[..., None]  # [B, F, T, 1]
        for i in range(3):
            x = nn.Conv(64, (3, 3), padding="SAME", name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=True, name=f"bn_{i}")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        B, Fp, Tp, C = x.shape
        # torch permute(0,3,2,1).reshape: time-major rows, (mel, ch) flattened
        # mel-major (audio_ntt.py:36-40)
        x = x.transpose(0, 2, 1, 3).reshape(B, Tp, Fp * C)
        x = nn.relu(nn.Dense(self.d, name="fc1")(x))
        x = nn.Dropout(0.3)(x, deterministic=deterministic)
        x = nn.relu(nn.Dense(self.d, name="fc2")(x))
        return x.mean(axis=1) + x.max(axis=1)  # mean + amax over time


def _log_mel(wavs: jnp.ndarray, cfg: ByolConfig) -> jnp.ndarray:
    """torchaudio MelSpectrogram (power 2, htk mel, center reflect) + log."""
    spec, _ = audio_ops.stft_spectrogram(
        wavs, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
        win_length=cfg.win_length, power=2.0,
    )  # [B, T', n_fft//2+1]
    fb = audio_ops.mel_scale_matrix(
        cfg.n_fft // 2 + 1, cfg.n_mels, SAMPLE_RATE, cfg.f_min, cfg.f_max
    )
    mel = jnp.einsum("btf,fm->bmt", spec, jnp.asarray(fb))
    return jnp.log(mel + EPS)


class ByolModel(nn.Module):
    """Windowed upstream: wavs[B, T] -> hidden_states[1, B, n_win, d]."""

    cfg: ByolConfig = BYOL_A_2048

    @nn.compact
    def __call__(self, wavs: jnp.ndarray, wav_lens: jnp.ndarray, deterministic=True):
        cfg = self.cfg
        B, T = wavs.shape
        window = int(cfg.window_secs * SAMPLE_RATE)
        step = int(cfg.stride_secs * SAMPLE_RATE)

        if cfg.batch_norm_stats:
            # BYOL-S frame_audio: pad window//2 front, window-window//2 back
            # (utils.py:70-74); frames while end <= padded length
            xp = jnp.pad(wavs, ((0, 0), (window // 2, window - window // 2)))
            n_win = T // step + 1
        else:
            # BYOL-A: non-overlapping windows from the start, zero-padded tail
            # (expert.py:84-91)
            starts_count = len(range(0, T, step))
            pad_to = (starts_count - 1) * step + window
            xp = jnp.pad(wavs, ((0, 0), (0, max(pad_to - T, 0))))
            n_win = starts_count

        starts = jnp.arange(n_win) * step
        segs = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(xp, s, window, axis=1),
            out_axes=1,
        )(starts).reshape(B * n_win, window)

        mel = _log_mel(segs, cfg)  # [B*n_win, n_mels, T']
        if cfg.batch_norm_stats:
            n = mel.shape[0]
            mean = mel.mean() / n  # the reference's 1/N quirk (utils.py:40-47)
            std = jnp.std(mel, ddof=1) / n
            mel = (mel - mean) / std
        else:
            mean, std = cfg.norm_stats
            mel = (mel - mean) / std

        emb = AudioNTT2020(cfg.n_mels, cfg.feature_d, name="net")(
            mel, deterministic=deterministic
        )
        emb = emb.reshape(B, n_win, cfg.feature_d)
        out_lens = jnp.minimum(wav_lens // step + 1, n_win)
        return emb[None], out_lens
