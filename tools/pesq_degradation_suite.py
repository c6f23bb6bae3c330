"""Degradation-suite comparison for the first-party PESQ scorers.

Emits the markdown table committed at docs/pesq_conformance.md: the
P.862-table scorer (``metric.quality.pesq``) vs the previous analytic
scorer (``pesq_analytic``) across a fixed degradation suite, wb (16 kHz)
and nb (8 kHz). Run: ``python tools/pesq_degradation_suite.py``.

The ITU envelope column states the score range the ITU P.862 tool is
known to produce for that degradation class on speech (published
AWGN/MNRU behavior); it is a plausibility anchor, not an oracle — no ITU
binding exists in this environment (see quality.py module docstring).
"""

from __future__ import annotations

import numpy as np

from s3prl_tpu.metric.quality import pesq, pesq_analytic


def speechlike(fs: int, secs: float = 4.0, seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    t = np.arange(int(fs * secs)) / fs
    x = np.zeros_like(t)
    for f0, a in [(220, 0.4), (440, 0.3), (880, 0.2), (1760, 0.12), (3000, 0.05)]:
        x += a * np.sin(2 * np.pi * f0 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2.3 * t + f0))
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 0.7 * t)
    return x + 0.001 * rng.randn(len(t))


def awgn(x: np.ndarray, snr_db: float, seed: int = 1) -> np.ndarray:
    rng = np.random.RandomState(seed)
    n = rng.randn(len(x))
    n *= np.sqrt((x**2).mean() / (n**2).mean() / 10 ** (snr_db / 10))
    return x + n


def lowpass(x: np.ndarray, fs: int, fc: float) -> np.ndarray:
    from scipy.signal import butter, lfilter

    b, a = butter(6, fc / (fs / 2.0), btype="lowpass")
    return lfilter(b, a, x)


def suite(fs: int):
    x = speechlike(fs)
    return x, [
        ("identity", x, "exact anchor (wb 4.644 / nb 4.549)"),
        ("gain x0.05", 0.05 * x, "= identity (level aligned)"),
        ("AWGN 40 dB", awgn(x, 40), "~4.2-4.6"),
        ("AWGN 30 dB", awgn(x, 30), "~3.2-3.8"),
        ("AWGN 20 dB", awgn(x, 20), "~2.4-3.0"),
        ("AWGN 10 dB", awgn(x, 10), "~1.7-2.2"),
        ("AWGN 0 dB", awgn(x, 0), "~1.1-1.6"),
        ("clip at 40% peak", np.clip(x, -0.4 * np.abs(x).max(), 0.4 * np.abs(x).max()), "mid-range"),
        ("clip at 15% peak", np.clip(x, -0.15 * np.abs(x).max(), 0.15 * np.abs(x).max()), "low"),
        ("lowpass 2 kHz" if fs == 16000 else "lowpass 1.5 kHz",
         lowpass(x, fs, 2000 if fs == 16000 else 1500), "bandwidth loss penalty"),
        ("+50 ms delay", np.concatenate([np.zeros(fs // 20), x])[: len(x)], "near identity (aligned)"),
    ]


def main() -> None:
    for fs, mode in [(16000, "wb"), (8000, "nb")]:
        x, rows = suite(fs)
        print(f"\n### {mode} ({fs} Hz)\n")
        print("| degradation | pesq (P.862 tables) | pesq_analytic | ITU envelope |")
        print("|---|---|---|---|")
        for name, deg, note in rows:
            a = pesq(x, deg, fs)
            b = pesq_analytic(x, deg, fs)
            print(f"| {name} | {a:.3f} | {b:.3f} | {note} |")


if __name__ == "__main__":
    main()
