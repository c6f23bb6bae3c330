"""PASE+ encoder — native TPU implementation (round 5).

The reference ships only a thin wrapper over the EXTERNAL ``pase`` package
(reference: s3prl/upstream/pase/expert.py:14-47 — ``wf_builder`` +
``load_pretrained``; the package is not vendored and its requirements.txt
is unmet even in the reference's own environment). This module implements
the PASE+ encoder architecture natively from its publication (Ravanelli et
al., "Multi-task self-supervised learning for Robust Speech Recognition",
ICASSP 2020):

    SincNet front end (64 learnable band-pass filters, kernel 251)
    -> 7 conv blocks (Conv1d + BatchNorm + PReLU), overall decimation 160
    -> QRNN context layer (fo-pooling)
    -> 1x1 projection W to the 256-d embedding
    -> + dense skip connections from every conv block (1x1-projected,
       mean-pool aligned to the output rate, summed at the output)

The hidden-state layout matches the reference wrapper's hook contract
(s3prl/upstream/pase/hubconf.py:82-91 + align_skip:53-64): the 7
dense-skip projections (aligned to the final rate), the W projection, and
the final output — 9 states of width 256 at a 160-sample hop.

TPU-first notes:
- the QRNN's fo-pooling recurrence c_t = f_t*c_{t-1} + (1-f_t)*z_t is a
  LINEAR recurrence, computed with ``jax.lax.associative_scan`` over T
  (log-depth on device) instead of a sequential loop — the whole encoder
  is a static-shape, scan-free XLA program apart from that one scan;
- the SincNet filters are materialized from the (low, band) cutoff
  parameters inside jit (tiny VPU work) and convolved as ONE
  ``lax.conv_general_dilated`` call, so the front end rides the MXU like
  every other conv stack here.

Checkpoint-level parity with the published Dropbox ckpt requires the
external package layout and is egress-gated; random-init shape/length/
hook-layout contracts are pinned in tests/test_models.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class PaseConfig:
    sinc_filters: int = 64
    sinc_kernel: int = 251
    sample_rate: int = 16000
    kwidths: Sequence[int] = (21, 11, 11, 11, 11, 11, 11)
    strides: Sequence[int] = (10, 4, 2, 2, 1, 1, 1)  # with the stride-1
    fmaps: Sequence[int] = (64, 128, 128, 256, 256, 512, 512)
    emb_dim: int = 256  # sinc front end: overall decimation 160
    qrnn_hidden: int = 512
    qrnn_window: int = 2


def _mel_init_cutoffs(n: int, sr: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mel-spaced initial (low_hz, band_hz) for the sinc band-pass bank —
    the standard SincNet initialization."""
    low_hz, high_hz = 30.0, sr / 2 - 100.0

    def hz_to_mel(hz):
        return 2595.0 * jnp.log10(1.0 + hz / 700.0)

    def mel_to_hz(mel):
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)

    mel = jnp.linspace(hz_to_mel(jnp.float32(low_hz)),
                       hz_to_mel(jnp.float32(high_hz)), n + 1)
    hz = mel_to_hz(mel)
    return hz[:-1], jnp.diff(hz)


class SincConv(nn.Module):
    """Learnable band-pass filter bank (SincNet). Parameters are the band
    edges, not the taps: filters are materialized in-jit and applied as one
    grouped conv (stride 1, SAME)."""

    filters: int = 64
    kernel: int = 251
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T] -> [B, T, F]
        low0, band0 = _mel_init_cutoffs(self.filters, self.sample_rate)
        low_hz = self.param("low_hz", lambda k: low0)
        band_hz = self.param("band_hz", lambda k: band0)

        sr = float(self.sample_rate)
        low = jnp.abs(low_hz) / sr  # normalized [0, 0.5]
        high = jnp.clip(low + jnp.abs(band_hz) / sr, 0.0, 0.5)
        half = (self.kernel - 1) // 2
        t = jnp.arange(1, half + 1, dtype=jnp.float32)  # right half

        def bandpass(lo, hi):
            # 2*hi*sinc(2*hi*t) - 2*lo*sinc(2*lo*t), Hamming-windowed
            right = (jnp.sin(2 * jnp.pi * hi * t) -
                     jnp.sin(2 * jnp.pi * lo * t)) / (jnp.pi * t)
            window = 0.54 - 0.46 * jnp.cos(
                2 * jnp.pi * (t + half) / self.kernel)
            right = right * window
            center = 2 * (hi - lo)
            f = jnp.concatenate([right[::-1], center[None], right])
            return f / (2 * (hi - lo) + 1e-8)

        taps = jax.vmap(bandpass)(low, high)  # [F, K]
        y = jax.lax.conv_general_dilated(
            x[:, None, :], taps[:, None, :],  # [B,1,T], [F,1,K]
            window_strides=(1,), padding="SAME",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return y.transpose(0, 2, 1)  # [B, T, F]


class QRNN(nn.Module):
    """Quasi-recurrent layer with fo-pooling (Bradbury et al. 2017), the
    context layer PASE+ adds over the conv stack. Gates come from a width-
    ``window`` causal conv; the recurrence is computed with an associative
    scan (linear in f): c_t = f_t*c_{t-1} + (1-f_t)*z_t, h_t = o_t*c_t."""

    hidden: int = 512
    window: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C] -> [B, T, H]
        if self.window > 1:
            x = jnp.pad(x, ((0, 0), (self.window - 1, 0), (0, 0)))
        gates = nn.Conv(3 * self.hidden, (self.window,), padding="VALID",
                        name="gates")(x)  # [B, T, 3H]
        z, f, o = jnp.split(gates, 3, axis=-1)
        z = jnp.tanh(z)
        f = jax.nn.sigmoid(f)
        o = jax.nn.sigmoid(o)

        def combine(a, b):
            fa, va = a
            fb, vb = b
            return fa * fb, fb * va + vb

        _, c = jax.lax.associative_scan(combine, (f, (1.0 - f) * z), axis=1)
        return o * c


class PaseModel(nn.Module):
    """PASE+ encoder. Returns (hidden_states [9, B, T', 256], out_lens)."""

    cfg: PaseConfig = field(default_factory=PaseConfig)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wavs: jnp.ndarray, wav_lens: jnp.ndarray,
                 deterministic: bool = True):
        cfg = self.cfg
        h = SincConv(cfg.sinc_filters, cfg.sinc_kernel, cfg.sample_rate,
                     name="sinc")(wavs.astype(jnp.float32))
        h = nn.BatchNorm(use_running_average=deterministic,
                         name="sinc_bn")(h)
        h = nn.PReLU(name="sinc_act")(h)

        skips = []
        for i, (kw, st, fm) in enumerate(
                zip(cfg.kwidths, cfg.strides, cfg.fmaps)):
            h = nn.Conv(fm, (kw,), strides=(st,), padding="SAME",
                        name=f"block{i}_conv")(h)
            h = nn.BatchNorm(use_running_average=deterministic,
                             name=f"block{i}_bn")(h)
            h = nn.PReLU(name=f"block{i}_act")(h)
            # dense skip: 1x1 projection to the embedding width
            # (reference wrapper hook: self.model.denseskips[i])
            skips.append(nn.Dense(cfg.emb_dim, name=f"denseskip{i}")(h))

        h = QRNN(cfg.qrnn_hidden, cfg.qrnn_window, name="qrnn")(h)
        w_out = nn.Dense(cfg.emb_dim, name="W")(h)  # hook: self.model.W

        T_out = w_out.shape[1]

        def align(skip):
            # mean-pool the higher-rate skip to the output rate
            # (reference: pase_plus hubconf align_skip:53-64)
            d = skip.shape[1] // T_out
            if d > 1:
                skip = skip[:, : T_out * d]
                skip = skip.reshape(skip.shape[0], T_out, d, skip.shape[-1])
                skip = skip.mean(axis=2)
            return skip[:, :T_out]

        skips = [align(s) for s in skips]
        final = w_out + sum(skips)

        hidden = jnp.stack(skips + [w_out, final]).astype(self.dtype)
        stride = 1
        for s in cfg.strides:
            stride *= s
        out_lens = jnp.minimum((wav_lens + stride - 1) // stride, T_out)
        return hidden, out_lens.astype(jnp.int32)
