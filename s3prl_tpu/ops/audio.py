"""Kaldi-compliance acoustic front-ends as pure JAX ops.

Re-implements (from the published Kaldi feature-extraction math, not from any
torch source) the semantics the reference gets from
``torchaudio.compliance.kaldi.{fbank,mfcc,spectrogram}`` — the backend of the
reference's baseline upstream (reference: s3prl/upstream/baseline/extracter.py:32-98,
fbank.yaml/mfcc.yaml) — plus the delta and CMVN transforms stacked on top.

Everything is batched and static-shape: inputs are padded ``wavs[B, T]`` with
``wav_lens[B]``; outputs are padded ``feats[B, F, D]`` with ``feat_lens[B]``.
Frames beyond an utterance's valid length are filled with that utterance's
last valid frame, which simultaneously (a) reproduces Kaldi's replicate-edge
semantics for the delta window and (b) pre-satisfies the repeat-last-frame
length-matching rule of the upstream API (reference: s3prl/nn/upstream.py:166-179).

Defaults follow Kaldi: 25 ms povey window, 10 ms shift, snip_edges=True,
preemphasis 0.97, DC offset removal, round-to-power-of-two FFT, dither=0.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
EPSILON = float(np.finfo(np.float32).eps)

# ---------------------------------------------------------------------------
# windows / framing
# ---------------------------------------------------------------------------


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def feature_window(window_type: str, size: int) -> np.ndarray:
    n = np.arange(size, dtype=np.float64)
    if window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(2 * np.pi * n / (size - 1))
    elif window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(2 * np.pi * n / (size - 1))
    elif window_type == "povey":  # like hanning but goes to zero at edges
        w = (0.5 - 0.5 * np.cos(2 * np.pi * n / (size - 1))) ** 0.85
    elif window_type == "rectangular":
        w = np.ones(size)
    elif window_type == "blackman":
        coeff = 0.42
        a = 2 * np.pi / (size - 1)
        w = coeff - 0.5 * np.cos(a * n) + (0.5 - coeff) * np.cos(2 * a * n)
    else:
        raise ValueError(f"unknown window type {window_type}")
    return w.astype(np.float32)


def num_frames(num_samples, frame_length: int, frame_shift: int, snip_edges: bool = True):
    """Frame count for given sample counts (array or int). Kaldi snip-edges rule."""
    if snip_edges:
        return jnp.where(
            num_samples < frame_length, 0, 1 + (num_samples - frame_length) // frame_shift
        )
    return (num_samples + frame_shift // 2) // frame_shift


def frame_wavs(wavs: jnp.ndarray, frame_length: int, frame_shift: int) -> jnp.ndarray:
    """Strided framing: wavs[B, T] -> frames[B, F, frame_length] (snip edges).

    Uses conv patch extraction so XLA lowers it to an efficient strided load
    instead of a gather.
    """
    B, T = wavs.shape
    F = max(0, 1 + (T - frame_length) // frame_shift)
    if F == 0:
        return jnp.zeros((B, 0, frame_length), wavs.dtype)
    patches = jax.lax.conv_general_dilated_patches(
        wavs[:, None, :],  # [B, C=1, T]
        filter_shape=(frame_length,),
        window_strides=(frame_shift,),
        padding="VALID",
        # identity-kernel conv must be exact — default precision would run
        # the extraction through bf16 on TPU and quantize the waveform
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, frame_length, F]
    return jnp.transpose(patches, (0, 2, 1))


# ---------------------------------------------------------------------------
# mel filterbank (Kaldi variant: 1127*ln(1+f/700), triangular in mel domain)
# ---------------------------------------------------------------------------


def _mel_scale(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def kaldi_mel_banks(
    num_bins: int,
    padded_window_size: int,
    sample_rate: float = SAMPLE_RATE,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi mel filterbank matrix, shape [num_bins, padded_window_size//2 + 1].

    The final (nyquist) column is zero, matching Kaldi which computes energies
    over only padded_window_size//2 bins.
    """
    num_fft_bins = padded_window_size // 2
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    assert 0.0 <= low_freq < high_freq <= nyquist
    fft_bin_width = sample_rate / padded_window_size
    mel_low = _mel_scale(low_freq)
    mel_high = _mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_mels = _mel_scale(fft_bin_width * np.arange(num_fft_bins))  # [nfft]
    left = mel_low + np.arange(num_bins)[:, None] * mel_delta
    center = left + mel_delta
    right = center + mel_delta
    up = (bin_mels[None, :] - left) / (center - left)
    down = (right - bin_mels[None, :]) / (right - center)
    weights = np.maximum(0.0, np.minimum(up, down))
    out = np.zeros((num_bins, num_fft_bins + 1), dtype=np.float32)
    out[:, :num_fft_bins] = weights
    return out


def kaldi_dct_matrix(num_ceps: int, num_mel_bins: int) -> np.ndarray:
    """Orthonormal DCT-II matrix rows 0..num_ceps-1, shape [num_mel_bins, num_ceps]."""
    n = np.arange(num_mel_bins, dtype=np.float64)
    k = np.arange(num_ceps, dtype=np.float64)
    dct = np.cos(np.pi / num_mel_bins * (n[:, None] + 0.5) * k[None, :])
    dct *= np.sqrt(2.0 / num_mel_bins)
    dct[:, 0] *= 1.0 / np.sqrt(2.0)
    return dct.astype(np.float32)


def _lifter_coeffs(num_ceps: int, cepstral_lifter: float) -> np.ndarray:
    i = np.arange(num_ceps, dtype=np.float64)
    return (1.0 + 0.5 * cepstral_lifter * np.sin(np.pi * i / cepstral_lifter)).astype(
        np.float32
    )


# ---------------------------------------------------------------------------
# core spectrogram pipeline
# ---------------------------------------------------------------------------


def _windowed_frames(
    wavs: jnp.ndarray,
    frame_length_ms: float,
    frame_shift_ms: float,
    sample_rate: float,
    window_type: str,
    preemphasis_coefficient: float,
    remove_dc_offset: bool,
    round_to_power_of_two: bool,
):
    frame_length = int(frame_length_ms * sample_rate / 1000.0)
    frame_shift = int(frame_shift_ms * sample_rate / 1000.0)
    frames = frame_wavs(wavs.astype(jnp.float32), frame_length, frame_shift)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis_coefficient != 0.0:
        # x[i] -= coeff * x[i-1]; the first sample uses itself as its left
        # neighbor (Kaldi convention)
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis_coefficient * prev
    window = jnp.asarray(feature_window(window_type, frame_length))
    frames = frames * window
    padded = _next_pow2(frame_length) if round_to_power_of_two else frame_length
    if padded > frame_length:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, padded - frame_length)))
    return frames, frame_length, frame_shift, padded


def _power_spectrum(frames: jnp.ndarray) -> jnp.ndarray:
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def _fill_tail_with_last_valid(feats: jnp.ndarray, feat_lens: jnp.ndarray) -> jnp.ndarray:
    """Replace frames at t >= len with each utterance's last valid frame."""
    B, F, D = feats.shape
    last_idx = jnp.clip(feat_lens - 1, 0, F - 1)  # [B]
    last = jnp.take_along_axis(feats, last_idx[:, None, None], axis=1)  # [B,1,D]
    t = jnp.arange(F)[None, :, None]
    return jnp.where(t < feat_lens[:, None, None], feats, last)


def spectrogram(
    wavs: jnp.ndarray,
    wav_lens: Optional[jnp.ndarray] = None,
    *,
    sample_rate: float = SAMPLE_RATE,
    frame_length: float = 25.0,
    frame_shift: float = 10.0,
    window_type: str = "povey",
    preemphasis_coefficient: float = 0.97,
    remove_dc_offset: bool = True,
    round_to_power_of_two: bool = True,
):
    """Kaldi log power spectrogram. Returns (feats[B,F,nfft//2+1], feat_lens[B])."""
    if wavs.ndim == 1:
        wavs = wavs[None]
    if wav_lens is None:
        wav_lens = jnp.full((wavs.shape[0],), wavs.shape[1], jnp.int32)
    frames, flen, fshift, _ = _windowed_frames(
        wavs, frame_length, frame_shift, sample_rate, window_type,
        preemphasis_coefficient, remove_dc_offset, round_to_power_of_two,
    )
    power = _power_spectrum(frames)
    feats = jnp.log(jnp.maximum(power, EPSILON))
    feat_lens = num_frames(wav_lens, flen, fshift).astype(jnp.int32)
    return _fill_tail_with_last_valid(feats, feat_lens), feat_lens


def fbank(
    wavs: jnp.ndarray,
    wav_lens: Optional[jnp.ndarray] = None,
    *,
    num_mel_bins: int = 23,
    sample_rate: float = SAMPLE_RATE,
    frame_length: float = 25.0,
    frame_shift: float = 10.0,
    window_type: str = "povey",
    preemphasis_coefficient: float = 0.97,
    remove_dc_offset: bool = True,
    round_to_power_of_two: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    use_log_fbank: bool = True,
    use_power: bool = True,
):
    """Kaldi-compliance log-mel filterbank.

    Returns (feats[B, F, num_mel_bins], feat_lens[B]). Padded frames hold the
    last valid frame of each utterance.
    """
    if wavs.ndim == 1:
        wavs = wavs[None]
    if wav_lens is None:
        wav_lens = jnp.full((wavs.shape[0],), wavs.shape[1], jnp.int32)
    frames, flen, fshift, padded = _windowed_frames(
        wavs, frame_length, frame_shift, sample_rate, window_type,
        preemphasis_coefficient, remove_dc_offset, round_to_power_of_two,
    )
    power = _power_spectrum(frames)
    if not use_power:
        power = jnp.sqrt(power)
    banks = jnp.asarray(
        kaldi_mel_banks(num_mel_bins, padded, sample_rate, low_freq, high_freq)
    )
    mel = jnp.einsum("bfk,mk->bfm", power, banks)
    if use_log_fbank:
        mel = jnp.log(jnp.maximum(mel, EPSILON))
    feat_lens = num_frames(wav_lens, flen, fshift).astype(jnp.int32)
    return _fill_tail_with_last_valid(mel, feat_lens), feat_lens


def mfcc(
    wavs: jnp.ndarray,
    wav_lens: Optional[jnp.ndarray] = None,
    *,
    num_ceps: int = 13,
    num_mel_bins: int = 23,
    cepstral_lifter: float = 22.0,
    sample_rate: float = SAMPLE_RATE,
    frame_length: float = 25.0,
    frame_shift: float = 10.0,
    window_type: str = "povey",
    preemphasis_coefficient: float = 0.97,
    remove_dc_offset: bool = True,
    round_to_power_of_two: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
):
    """Kaldi-compliance MFCC. Returns (feats[B, F, num_ceps], feat_lens[B])."""
    logmel, feat_lens = fbank(
        wavs, wav_lens,
        num_mel_bins=num_mel_bins, sample_rate=sample_rate,
        frame_length=frame_length, frame_shift=frame_shift,
        window_type=window_type, preemphasis_coefficient=preemphasis_coefficient,
        remove_dc_offset=remove_dc_offset, round_to_power_of_two=round_to_power_of_two,
        low_freq=low_freq, high_freq=high_freq, use_log_fbank=True, use_power=True,
    )
    dct = jnp.asarray(kaldi_dct_matrix(num_ceps, num_mel_bins))
    ceps = logmel @ dct
    if cepstral_lifter != 0.0:
        ceps = ceps * jnp.asarray(_lifter_coeffs(num_ceps, cepstral_lifter))
    return ceps, feat_lens


# ---------------------------------------------------------------------------
# deltas + CMVN (reference: baseline/extracter.py Delta/CMVN)
# ---------------------------------------------------------------------------


def compute_deltas(feats: jnp.ndarray, win_length: int = 5) -> jnp.ndarray:
    """Regression deltas with replicate padding over time.

    feats: [B, F, D]. Matches torchaudio.functional.compute_deltas semantics:
    delta_t = sum_n n*(x[t+n]-x[t-n]) / (2*sum n^2), n=1..(win_length-1)//2.
    Padded-tail frames must already hold the last valid frame for exact
    per-utterance replicate-edge behavior (see _fill_tail_with_last_valid).
    """
    n = (win_length - 1) // 2
    denom = 2 * sum(i * i for i in range(1, n + 1))
    kernel = jnp.arange(-n, n + 1, dtype=feats.dtype) / denom  # [-n..n]
    # replicate-pad time axis
    left = jnp.repeat(feats[:, :1, :], n, axis=1)
    right = jnp.repeat(feats[:, -1:, :], n, axis=1)
    padded = jnp.concatenate([left, feats, right], axis=1)  # [B, F+2n, D]
    # correlation along time: out[t] = sum_k kernel[k] * padded[t+k]
    out = jnp.zeros_like(feats)
    for k in range(2 * n + 1):
        out = out + kernel[k] * jax.lax.dynamic_slice_in_dim(padded, k, feats.shape[1], axis=1)
    return out


def add_deltas(feats: jnp.ndarray, order: int = 2, win_length: int = 5) -> jnp.ndarray:
    """Concatenate feats with its deltas up to `order` along the feature dim."""
    outs = [feats]
    for _ in range(order):
        outs.append(compute_deltas(outs[-1], win_length))
    return jnp.concatenate(outs, axis=-1)


def cmvn(
    feats: jnp.ndarray,
    feat_lens: Optional[jnp.ndarray] = None,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Per-utterance cepstral mean/var normalization over valid frames.

    Matches the reference's CMVN (x - mean) / (eps + std) with torch's
    unbiased std (reference: baseline/extracter.py:78-92).
    """
    B, F, D = feats.shape
    if feat_lens is None:
        mean = jnp.mean(feats, axis=1, keepdims=True)
        var = jnp.sum((feats - mean) ** 2, axis=1, keepdims=True) / jnp.maximum(F - 1, 1)
    else:
        mask = (jnp.arange(F)[None, :] < feat_lens[:, None])[..., None]  # [B,F,1]
        denom = jnp.maximum(feat_lens[:, None, None], 1).astype(feats.dtype)
        mean = jnp.sum(feats * mask, axis=1, keepdims=True) / denom
        var = jnp.sum(jnp.where(mask, (feats - mean) ** 2, 0.0), axis=1, keepdims=True) / (
            jnp.maximum(denom - 1.0, 1.0)
        )
    return (feats - mean) / (eps + jnp.sqrt(var))


# ---------------------------------------------------------------------------
# STFT path (torch.stft-style, hann window, center+reflect) — used by the
# mockingjay/tera mel pipeline (reference: baseline/preprocessor.py:64-110)
# ---------------------------------------------------------------------------


def stft_spectrogram(
    wavs: jnp.ndarray,
    wav_lens: Optional[jnp.ndarray] = None,
    *,
    n_fft: int = 400,
    hop_length: int = 160,
    win_length: int = 400,
    power: float = 2.0,
    sample_rate: float = SAMPLE_RATE,
):
    """Center-padded (reflect) hann STFT magnitude^power: [B, F, n_fft//2+1]."""
    if wavs.ndim == 1:
        wavs = wavs[None]
    B, T = wavs.shape
    if wav_lens is None:
        wav_lens = jnp.full((B,), T, jnp.int32)
    pad = n_fft // 2
    x = jnp.pad(wavs, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_wavs(x, n_fft, hop_length)  # window centered at t*hop
    win = np.zeros(n_fft, dtype=np.float32)
    n = np.arange(win_length)
    hann = (0.5 - 0.5 * np.cos(2 * np.pi * n / win_length)).astype(np.float32)
    start = (n_fft - win_length) // 2
    win[start : start + win_length] = hann
    frames = frames * jnp.asarray(win)
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** power
    feat_lens = (wav_lens // hop_length + 1).astype(jnp.int32)
    return spec, feat_lens


def mel_scale_matrix(
    n_freqs: int,
    n_mels: int,
    sample_rate: float = SAMPLE_RATE,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> np.ndarray:
    """HTK-style mel filterbank (torchaudio.transforms.MelScale semantics)."""
    f_max = f_max or sample_rate / 2
    m_min = 2595.0 * math.log10(1.0 + f_min / 700.0)
    m_max = 2595.0 * math.log10(1.0 + f_max / 700.0)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)  # [n_freqs, n_mels]


def log_mel(
    wavs: jnp.ndarray,
    wav_lens: Optional[jnp.ndarray] = None,
    *,
    n_fft: int = 400,
    hop_length: int = 160,
    win_length: int = 400,
    n_mels: int = 80,
    sample_rate: float = SAMPLE_RATE,
    eps: float = 1e-10,
):
    """log(mel(stft^2)) — the mockingjay/tera on-the-fly mel front-end."""
    spec, feat_lens = stft_spectrogram(
        wavs, wav_lens, n_fft=n_fft, hop_length=hop_length,
        win_length=win_length, power=2.0, sample_rate=sample_rate,
    )
    fb = jnp.asarray(mel_scale_matrix(spec.shape[-1], n_mels, sample_rate))
    mel = spec @ fb
    return jnp.log(mel + eps), feat_lens


# ---------------------------------------------------------------------------
# complex STFT / iSTFT (for enhancement & separation reconstruction paths;
# reference tasks: s3prl/downstream/enhancement_stft, separation_stft)
# ---------------------------------------------------------------------------


def stft_complex(
    wavs: jnp.ndarray,
    *,
    n_fft: int = 512,
    hop_length: int = 160,
    win_length: int = 400,
):
    """Center-padded hann STFT, complex output [B, F, n_fft//2+1]."""
    if wavs.ndim == 1:
        wavs = wavs[None]
    pad = n_fft // 2
    x = jnp.pad(wavs, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_wavs(x, n_fft, hop_length)
    win = np.zeros(n_fft, dtype=np.float32)
    n = np.arange(win_length)
    hann = (0.5 - 0.5 * np.cos(2 * np.pi * n / win_length)).astype(np.float32)
    start = (n_fft - win_length) // 2
    win[start : start + win_length] = hann
    return jnp.fft.rfft(frames * jnp.asarray(win), axis=-1)


def istft(
    spec: jnp.ndarray,  # [B, F, n_fft//2+1] complex
    *,
    n_fft: int = 512,
    hop_length: int = 160,
    win_length: int = 400,
    length: Optional[int] = None,
):
    """Inverse STFT with hann-window overlap-add + COLA normalization."""
    B, F, _ = spec.shape
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [B, F, n_fft]
    win = np.zeros(n_fft, dtype=np.float32)
    n = np.arange(win_length)
    hann = (0.5 - 0.5 * np.cos(2 * np.pi * n / win_length)).astype(np.float32)
    start = (n_fft - win_length) // 2
    win[start : start + win_length] = hann
    winj = jnp.asarray(win)
    frames = frames * winj

    total = n_fft + hop_length * (F - 1)
    idx = (np.arange(F)[:, None] * hop_length + np.arange(n_fft)[None, :]).reshape(-1)
    out = jnp.zeros((B, total), frames.dtype)
    out = out.at[:, jnp.asarray(idx)].add(frames.reshape(B, -1))
    norm = jnp.zeros((total,), frames.dtype)
    norm = norm.at[jnp.asarray(idx)].add(jnp.tile(winj ** 2, (F,)))
    out = out / jnp.maximum(norm, 1e-8)[None]

    pad = n_fft // 2
    out = out[:, pad:]
    if length is not None:
        out = out[:, :length]
    return out
