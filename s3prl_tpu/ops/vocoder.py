"""Griffin-Lim vocoder — native waveform synthesis for VC/TTS-style tasks.

The reference's VC recipes synthesize with an externally-trained neural
vocoder pulled at runtime (a2o-vc-vcc2020 downloads a Parallel WaveGAN);
with no egress and no pretrained artifact, the first-party path is classic
Griffin-Lim phase recovery over the same analysis parameters the VC task
trains against (ops/audio.log_mel: n_fft 400, hop 160, power-2 mel):

    log-mel -> mel power (exp) -> linear power (mel-filterbank pinv, clipped)
            -> |STFT| -> Griffin-Lim iterations -> waveform

Everything is jittable jnp (batched, static shapes); quality is the usual
GL baseline, deterministic, and dependency-free.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import audio as audio_ops


def _stft_complex(wavs, n_fft, hop_length, win_length):
    pad = n_fft // 2
    x = jnp.pad(wavs, ((0, 0), (pad, pad)), mode="reflect")
    frames = audio_ops.frame_wavs(x, n_fft, hop_length)
    win = np.zeros(n_fft, np.float32)
    n = np.arange(win_length)
    hann = (0.5 - 0.5 * np.cos(2 * np.pi * n / win_length)).astype(np.float32)
    win[(n_fft - win_length) // 2 : (n_fft - win_length) // 2 + win_length] = hann
    return jnp.fft.rfft(frames * jnp.asarray(win), axis=-1)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "n_iter"))
def griffin_lim(
    mag: jnp.ndarray,  # [B, F, n_fft//2+1] linear magnitude
    n_fft: int = 400,
    hop_length: int = 160,
    win_length: int = 400,
    n_iter: int = 32,
):
    """Iterative phase recovery; returns wav [B, hop*(F-1)] roughly."""
    B, F, _ = mag.shape
    length = hop_length * (F - 1)
    angle = jnp.zeros_like(mag)

    def body(_, angle):
        spec = mag * jnp.exp(1j * angle.astype(jnp.complex64))
        wav = audio_ops.istft(
            spec, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
            length=length,
        )
        re = _stft_complex(wav, n_fft, hop_length, win_length)[:, :F]
        return jnp.angle(re)

    angle = jax.lax.fori_loop(0, n_iter, body, angle)
    spec = mag * jnp.exp(1j * angle.astype(jnp.complex64))
    return audio_ops.istft(
        spec, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        length=length,
    )


def log_mel_to_wav(
    log_mel: jnp.ndarray,  # [B, F, n_mels] — ops/audio.log_mel output
    n_fft: int = 400,
    hop_length: int = 160,
    win_length: int = 400,
    n_mels: int = 80,
    sample_rate: float = 16000.0,
    n_iter: int = 32,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Invert the log_mel front end back to a waveform via Griffin-Lim."""
    fb = audio_ops.mel_scale_matrix(n_fft // 2 + 1, n_mels, sample_rate)
    inv = np.linalg.pinv(fb)  # [n_mels, F_lin]
    power = jnp.exp(log_mel) - eps
    lin_power = jnp.clip(power @ jnp.asarray(inv), 0.0, None)
    mag = jnp.sqrt(lin_power)
    wav = griffin_lim(mag, n_fft=n_fft, hop_length=hop_length,
                      win_length=win_length, n_iter=n_iter)
    peak = jnp.max(jnp.abs(wav), axis=-1, keepdims=True)
    return wav / jnp.maximum(peak, 1e-6) * 0.95
