"""First-party speech-quality metrics: STOI and PESQ (numpy, no native deps).

The reference computes ``["si_sdr", "stoi", "pesq"]`` for SE/SS through
asteroid's ``get_metrics`` (pystoi + the ITU P.862 C binding) and selects
the SE dev-best checkpoint by PESQ
(/root/reference/s3prl/downstream/enhancement_stft/expert.py:38,299,383-385;
separation_stft2/expert.py:356 uses si_sdr for dev-best). Neither native
package exists in this environment, so both metrics are implemented here
from their published algorithm descriptions:

- ``stoi``: Taal, Hendriks, Heusdens, Jensen, "An Algorithm for
  Intelligibility Prediction of Time-Frequency Weighted Noisy Speech"
  (IEEE TASLP 2011). Full algorithm — 10 kHz resample, silent-frame
  removal (40 dB dynamic range), 256/512 hann STFT, 15 one-third-octave
  bands from 150 Hz, 30-frame segments, per-band normalization + (-15 dB)
  clipping, per-band linear correlation. Matches the public pystoi
  constants; the extended (eSTOI) variant is included for completeness.

- ``pesq``: structured after ITU-T P.862 (narrowband) / P.862.2 (wideband):
  level alignment, input filtering, envelope-based time alignment, bark
  pitch-power densities, partial frequency/gain compensation, Zwicker-law
  loudness, asymmetric + symmetric disturbance with masking deadzone,
  L6-over-320ms / L2-over-time aggregation, and the published logistic
  MOS-LQO mappings (P.862.1/P.862.2). CAVEAT: the exact ITU band tables
  and calibration constants are not reproducible in this offline
  environment, so per-band constants are derived analytically (Schroeder
  bark scale, Terhardt absolute-threshold curve). Identity anchors land on
  the known reference values (wb: 4.644, nb: 4.549) because zero
  disturbance is mapping-exact; absolute scores on degraded signals are
  calibrated to track the ITU implementation's behavior on AWGN/level/
  filtering degradations but are NOT bit-exact to the C reference — they
  are monotone quality scores suitable for the reference's model-selection
  use (dev-best by mean PESQ). tests/test_quality_metrics.py pins the
  anchors and the monotonicity contract.
"""

from __future__ import annotations

import numpy as np

EPS = np.finfo(np.float64).eps


# ---------------------------------------------------------------------------
# shared DSP helpers
# ---------------------------------------------------------------------------


def _resample(x: np.ndarray, fs_in: int, fs_out: int) -> np.ndarray:
    if fs_in == fs_out:
        return x
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(fs_in, fs_out)
    return resample_poly(x, fs_out // g, fs_in // g)


def _frame(x: np.ndarray, framelen: int, hop: int) -> np.ndarray:
    """[T] -> [n_frames, framelen] (drops the tail that doesn't fill a frame)."""
    n = 1 + max(0, (len(x) - framelen)) // hop
    idx = np.arange(framelen)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


# ---------------------------------------------------------------------------
# STOI (Taal et al. 2011)
# ---------------------------------------------------------------------------

_STOI_FS = 10000
_STOI_FRAME = 256
_STOI_NFFT = 512
_STOI_HOP = 128
_STOI_NBANDS = 15
_STOI_MINFREQ = 150
_STOI_SEG = 30  # frames per short-time segment (384 ms)
_STOI_BETA = -15.0  # lower SDR clipping bound (dB)
_STOI_DYN_RANGE = 40.0  # silent-frame energy range (dB)


def _stoi_window() -> np.ndarray:
    # matlab-style hanning(N): the periodic-ish variant without zero endpoints
    return np.hanning(_STOI_FRAME + 2)[1:-1]


def _remove_silent_frames(x: np.ndarray, y: np.ndarray):
    """Drop frames whose CLEAN energy is >40 dB below the loudest frame,
    overlap-adding the survivors back into continuous signals."""
    w = _stoi_window()
    xf = _frame(x, _STOI_FRAME, _STOI_HOP) * w
    yf = _frame(y, _STOI_FRAME, _STOI_HOP) * w
    energies = 20 * np.log10(np.linalg.norm(xf, axis=1) + EPS)
    mask = energies > (np.max(energies) - _STOI_DYN_RANGE)
    xf, yf = xf[mask], yf[mask]
    if len(xf) == 0:
        return np.zeros(0), np.zeros(0)
    n_out = _STOI_HOP * (len(xf) - 1) + _STOI_FRAME
    x_out = np.zeros(n_out)
    y_out = np.zeros(n_out)
    for i in range(len(xf)):  # 50%-overlap hann OLA reconstructs unit gain
        s = i * _STOI_HOP
        x_out[s : s + _STOI_FRAME] += xf[i]
        y_out[s : s + _STOI_FRAME] += yf[i]
    return x_out, y_out


def _thirdoct():
    """One-third-octave band matrix [15, 257] + center freqs, per the STOI
    paper (150 Hz * 2^(k/3) centers snapped to FFT bins)."""
    f = np.linspace(0, _STOI_FS, _STOI_NFFT + 1)[: _STOI_NFFT // 2 + 1]
    k = np.arange(_STOI_NBANDS, dtype=np.float64)
    freq_low = _STOI_MINFREQ * 2.0 ** ((2 * k - 1) / 6)
    freq_high = _STOI_MINFREQ * 2.0 ** ((2 * k + 1) / 6)
    obm = np.zeros((_STOI_NBANDS, len(f)))
    for i in range(_STOI_NBANDS):
        lo = int(np.argmin((f - freq_low[i]) ** 2))
        hi = int(np.argmin((f - freq_high[i]) ** 2))
        obm[i, lo:hi] = 1.0
    return obm


def _stoi_spectrogram(x: np.ndarray) -> np.ndarray:
    w = _stoi_window()
    frames = _frame(x, _STOI_FRAME, _STOI_HOP) * w
    return np.abs(np.fft.rfft(frames, n=_STOI_NFFT, axis=1)) ** 2  # [n, 257]


def stoi(x: np.ndarray, y: np.ndarray, fs_sig: int, extended: bool = False) -> float:
    """Short-Time Objective Intelligibility of degraded ``y`` vs clean ``x``.

    Returns a score in ~[0, 1]; 1.0 for identical signals. ``extended``
    selects eSTOI (Jensen & Taal 2016, spectrally-normalized correlation).
    """
    x = np.asarray(x, np.float64).reshape(-1)
    y = np.asarray(y, np.float64).reshape(-1)
    if x.shape != y.shape:
        n = min(len(x), len(y))
        x, y = x[:n], y[:n]
    x = _resample(x, fs_sig, _STOI_FS)
    y = _resample(y, fs_sig, _STOI_FS)
    x, y = _remove_silent_frames(x, y)
    if len(x) < _STOI_FRAME + _STOI_HOP * (_STOI_SEG - 1):
        return float("nan")  # too short / fully silent (pystoi warns too)

    obm = _thirdoct()
    X = np.sqrt(obm @ _stoi_spectrogram(x).T)  # [15, n_frames]
    Y = np.sqrt(obm @ _stoi_spectrogram(y).T)

    n_frames = X.shape[1]
    n_seg = n_frames - _STOI_SEG + 1
    # short-time segments [n_seg, 15, 30]
    seg_idx = np.arange(_STOI_SEG)[None, :] + np.arange(n_seg)[:, None]
    Xs = np.transpose(X[:, seg_idx], (1, 0, 2))
    Ys = np.transpose(Y[:, seg_idx], (1, 0, 2))

    if extended:
        # eSTOI: row+column normalized segments, correlation over the whole
        # spectrogram segment
        Xn = Xs - Xs.mean(axis=2, keepdims=True)
        Xn /= np.linalg.norm(Xn, axis=2, keepdims=True) + EPS
        Yn = Ys - Ys.mean(axis=2, keepdims=True)
        Yn /= np.linalg.norm(Yn, axis=2, keepdims=True) + EPS
        Xn = Xn - Xn.mean(axis=1, keepdims=True)
        Xn /= np.linalg.norm(Xn, axis=1, keepdims=True) + EPS
        Yn = Yn - Yn.mean(axis=1, keepdims=True)
        Yn /= np.linalg.norm(Yn, axis=1, keepdims=True) + EPS
        return float(np.sum(Xn * Yn / _STOI_SEG) / n_seg)

    # per-band energy normalization of the degraded segment + SDR clipping
    alpha = np.sqrt(
        np.sum(Xs**2, axis=2, keepdims=True) / (np.sum(Ys**2, axis=2, keepdims=True) + EPS)
    )
    Yn = Ys * alpha
    clip = 10 ** (-_STOI_BETA / 20.0)
    Yp = np.minimum(Yn, Xs * (1 + clip))

    Xc = Xs - Xs.mean(axis=2, keepdims=True)
    Yc = Yp - Yp.mean(axis=2, keepdims=True)
    Xc /= np.linalg.norm(Xc, axis=2, keepdims=True) + EPS
    Yc /= np.linalg.norm(Yc, axis=2, keepdims=True) + EPS
    d = np.sum(Xc * Yc, axis=2)  # [n_seg, 15] per-band correlations
    return float(d.mean())


# ---------------------------------------------------------------------------
# PESQ (structured after ITU-T P.862 / P.862.2)
# ---------------------------------------------------------------------------

_PESQ_NBARK = 49
_PESQ_ZWICKER = 0.23
_PESQ_SL = 30.0  # loudness scale: calibrated so AWGN degradations on a
#                  synthetic speech-like signal land in the ITU
#                  implementation's typical score ranges (wb ~3.7 @30 dB SNR,
#                  ~2.4 @20 dB, ~1.9 @10 dB, ~1.6 @0 dB); identity is exact
#                  regardless (zero disturbance short-circuits calibration)


def _bark_of_hz(f):
    return 7.0 * np.arcsinh(np.asarray(f, np.float64) / 650.0)


def _hz_of_bark(z):
    return 650.0 * np.sinh(np.asarray(z, np.float64) / 7.0)


def _abs_thresh_db(f_hz: np.ndarray) -> np.ndarray:
    """Terhardt absolute hearing threshold (dB SPL) per band center."""
    f = np.maximum(f_hz, 20.0) / 1000.0
    return 3.64 * f**-0.8 - 6.5 * np.exp(-0.6 * (f - 3.3) ** 2) + 1e-3 * f**4


def _pesq_geometry(fs: int):
    if fs == 16000:
        nf, fmax = 512, 8000.0
    elif fs == 8000:
        nf, fmax = 256, 4000.0
    else:
        raise ValueError(f"PESQ supports fs in (8000, 16000), got {fs}")
    return nf, fmax


def _bark_bands(fs: int):
    """49 bark bands uniform on the Schroeder scale up to fs/2: returns
    (bin->band assignment [n_bins], band widths in bark, band centers Hz)."""
    nf, fmax = _pesq_geometry(fs)
    n_bins = nf // 2 + 1
    f = np.linspace(0, fs / 2.0, n_bins)
    z_edges = np.linspace(0.0, float(_bark_of_hz(fmax)), _PESQ_NBARK + 1)
    z = _bark_of_hz(f)
    band = np.clip(np.searchsorted(z_edges, z, side="right") - 1, 0, _PESQ_NBARK - 1)
    centers_hz = _hz_of_bark(0.5 * (z_edges[:-1] + z_edges[1:]))
    widths = np.diff(z_edges)
    return band, widths, centers_hz


def _band_pow(power_spec: np.ndarray, band: np.ndarray) -> np.ndarray:
    """[n_frames, n_bins] power -> [n_frames, 49] pitch power densities."""
    out = np.zeros((power_spec.shape[0], _PESQ_NBARK))
    np.add.at(out.T, band, power_spec.T)
    return out


def _level_align(x: np.ndarray, fs: int) -> np.ndarray:
    """Scale to a fixed active level using 325–3250 Hz band power (the
    P.862 level-alignment band)."""
    spec = np.fft.rfft(x)
    f = np.linspace(0, fs / 2.0, len(spec))
    bandpass = (f >= 325) & (f <= 3250)
    band_pow = np.sum(np.abs(spec[bandpass]) ** 2) / max(len(x), 1) ** 2 * 2
    target = 1e-2  # fixed active-band mean-square target
    gain = np.sqrt(target / max(band_pow, 1e-20))
    return x * gain


def _input_filter(x: np.ndarray, fs: int, mode: str) -> np.ndarray:
    """Frequency-domain input filter: wb = 100 Hz high-pass with the
    P.862.2 soft knee; nb = IRS-receive-like telephone bandpass."""
    spec = np.fft.rfft(x)
    f = np.linspace(0, fs / 2.0, len(spec))
    if mode == "wb":
        gain = 1.0 / (1.0 + (100.0 / np.maximum(f, 1e-3)) ** 4)
    else:
        # smooth telephone band emphasis ~300-3100 Hz
        lo = 1.0 / (1.0 + (310.0 / np.maximum(f, 1e-3)) ** 4)
        hi = 1.0 / (1.0 + (f / 3500.0) ** 8)
        gain = lo * hi
    return np.fft.irfft(spec * gain, n=len(x))


def _time_align(ref: np.ndarray, deg: np.ndarray, fs: int) -> np.ndarray:
    """Global delay estimate via cross-correlation of 4 ms energy
    envelopes; shifts ``deg`` onto ``ref``. (The ITU utterance-splitting
    fine alignment matters for telephony delay jitter; SE/SS pipelines
    compare same-clock signals, where a single global delay suffices.)"""
    hop = max(fs // 250, 1)
    n = min(len(ref), len(deg)) // hop
    if n < 8:
        return deg
    er = np.square(ref[: n * hop].reshape(n, hop)).sum(1)
    ed = np.square(deg[: n * hop].reshape(n, hop)).sum(1)
    er -= er.mean()
    ed -= ed.mean()
    corr = np.correlate(ed, er, mode="full")
    delay = (int(np.argmax(corr)) - (n - 1)) * hop
    if delay > 0:
        deg = deg[delay:]
    elif delay < 0:
        deg = np.concatenate([np.zeros(-delay), deg])
    return deg


def _loudness(ppd: np.ndarray, p0: np.ndarray) -> np.ndarray:
    """Zwicker-law loudness density from pitch power density (ITU-T P.862
    perceptual model): Sl*(P0/0.5)^g * ((0.5 + 0.5*P/P0)^g - 1)."""
    g = _PESQ_ZWICKER
    loud = _PESQ_SL * (p0 / 0.5) ** g * ((0.5 + 0.5 * ppd / p0) ** g - 1.0)
    return np.where(ppd > p0, np.maximum(loud, 0.0), 0.0)


def _lp(x: np.ndarray, p: float, axis=-1) -> np.ndarray:
    return np.mean(np.abs(x) ** p, axis=axis) ** (1.0 / p)


def pesq(ref: np.ndarray, deg: np.ndarray, fs: int = 16000, mode: str | None = None) -> float:
    """PESQ MOS-LQO of degraded ``deg`` vs reference ``ref``.

    mode "wb" (P.862.2, default for fs=16000) or "nb" (P.862/P.862.1,
    default for fs=8000). Identity returns the known reference anchors
    (wb 4.644 / nb 4.549); see the module docstring for the calibration
    caveat on degraded signals.
    """
    if mode is None:
        mode = "wb" if fs == 16000 else "nb"
    ref = np.asarray(ref, np.float64).reshape(-1)
    deg = np.asarray(deg, np.float64).reshape(-1)

    ref = _level_align(ref - ref.mean(), fs)
    deg = _level_align(deg - deg.mean(), fs)
    ref = _input_filter(ref, fs, mode)
    deg = _input_filter(deg, fs, mode)
    deg = _time_align(ref, deg, fs)
    n = min(len(ref), len(deg))
    ref, deg = ref[:n], deg[:n]

    nf, _ = _pesq_geometry(fs)
    hop = nf // 2
    if n < 2 * nf:
        return float("nan")
    w = np.hanning(nf)
    rf = _frame(ref, nf, hop) * w
    df = _frame(deg, nf, hop) * w
    rp = np.abs(np.fft.rfft(rf, axis=1)) ** 2  # [T, bins]
    dp = np.abs(np.fft.rfft(df, axis=1)) ** 2

    band, widths, centers = _bark_bands(fs)
    rb = _band_pow(rp, band)  # [T, 49] pitch power densities
    db = _band_pow(dp, band)

    # absolute hearing threshold per band, tied to the fixed alignment level
    # (_level_align target ≙ 73 dB SPL active speech level)
    p0 = 10.0 ** ((_abs_thresh_db(centers) - 73.0) / 10.0) * 1e-2

    # speech-active frames: total ref band power above the silence floor
    frame_pow = rb.sum(1)
    active = frame_pow > (frame_pow.max() + EPS) * 1e-4
    if not np.any(active):
        return float("nan")

    # partial frequency compensation: per-band ratio of mean densities over
    # active frames, clipped to +-20 dB, applied to the REFERENCE. The
    # additive offset is scaled to the speech level (the ITU constant plays
    # the same role): bands well below it get ratio ~= 1, so a stationary
    # noise floor is NOT compensated away — only genuine linear filtering
    # of speech-carrying bands is.
    mean_r = rb[active].mean(0)
    mean_d = db[active].mean(0)
    off = 1e-3 * float(mean_r.max()) + EPS
    freq_comp = np.clip((mean_d + off) / (mean_r + off), 0.01, 100.0)
    rb_c = rb * freq_comp[None, :]

    # short-term gain compensation: smoothed frame power ratio, applied to
    # the DEGRADED density
    goff = 1e-2 * float(frame_pow.max()) + EPS
    ratio = (rb_c.sum(1) + goff) / (db.sum(1) + goff)
    gain = np.empty_like(ratio)
    g = 1.0
    for t in range(len(ratio)):
        g = 0.8 * g + 0.2 * ratio[t]
        gain[t] = np.clip(g, 3e-4, 5.0)
    db_c = db * gain[:, None]

    r_loud = _loudness(rb_c, p0[None, :])
    d_loud = _loudness(db_c, p0[None, :])

    # disturbance with masking deadzone
    diff = d_loud - r_loud
    dead = 0.25 * np.minimum(d_loud, r_loud)
    disturbance = np.sign(diff) * np.maximum(np.abs(diff) - dead, 0.0)

    # asymmetry factor: additive (noise) distortions weigh more than
    # components the codec removed
    asym = ((db_c + 50.0 * p0[None, :]) / (rb_c + 50.0 * p0[None, :])) ** 1.2
    asym = np.where(asym < 3.0, 0.0, np.minimum(asym, 12.0))

    wgt = widths[None, :] / widths.sum()
    d_frame = np.sqrt(np.sum(wgt * disturbance**2, axis=1))  # L2 over bands
    da_frame = np.sum(wgt * np.abs(disturbance) * asym, axis=1)  # L1 over bands

    # emphasis against loud-frame dominance + clipping, per P.862
    h = (frame_pow + 1e5 * p0.sum()) ** 0.04
    d_frame = np.minimum(d_frame / h, 45.0)
    da_frame = np.minimum(da_frame / h, 45.0)

    # L6 over 320 ms intervals, L2 over intervals
    span = 20 if fs == 16000 else 10  # frames per 320 ms at 16/32 ms hops
    n_int = max(len(d_frame) // span, 1)
    trim = n_int * span
    d_sym = _lp(_lp(d_frame[:trim].reshape(n_int, span), 6.0, axis=1), 2.0)
    d_asym = _lp(_lp(da_frame[:trim].reshape(n_int, span), 6.0, axis=1), 2.0)

    raw = 4.5 - 0.1 * float(d_sym) - 0.0309 * float(d_asym)
    raw = float(np.clip(raw, -0.5, 4.5))

    if mode == "wb":  # P.862.2 mapping
        return 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))
    # P.862.1 mapping (narrowband)
    return 0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607))
