"""First-party STOI / PESQ regression tests (metric/quality.py).

No oracle packages exist in this environment (pystoi / the ITU P.862 C
binding are absent, no egress), so the contract pinned here is:
- exact identity anchors: the published identity outputs of the reference
  implementations (pesq wb 4.6439 / nb 4.5486 come straight from the
  P.862.2/P.862.1 logistic maps at zero disturbance; stoi identity = 1.0);
- strict monotonicity in SNR over the model-selection range;
- the P.862 invariances (global gain, small delay).
"""

import numpy as np
import pytest

from s3prl_tpu.metric.quality import pesq, stoi


def _speechlike(fs=16000, secs=3.0, seed=0):
    """AM harmonic stack with a slow envelope — broadband-ish, modulated,
    deterministic; stands in for speech in metric behavior tests."""
    rng = np.random.RandomState(seed)
    t = np.arange(int(fs * secs)) / fs
    x = np.zeros_like(t)
    for f0, a in [(220, 0.4), (440, 0.3), (880, 0.2), (1760, 0.12), (3000, 0.05)]:
        x += a * np.sin(2 * np.pi * f0 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2.3 * t + f0))
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 0.7 * t)
    return x + 0.001 * rng.randn(len(t))


def _add_noise(x, snr_db, seed=1):
    rng = np.random.RandomState(seed)
    n = rng.randn(len(x))
    n *= np.sqrt((x**2).mean() / (n**2).mean() / 10 ** (snr_db / 10))
    return x + n


class TestStoi:
    def test_identity_is_one(self):
        x = _speechlike()
        assert stoi(x, x, 16000) == pytest.approx(1.0, abs=1e-6)
        assert stoi(x, x, 16000, extended=True) == pytest.approx(1.0, abs=1e-6)

    def test_monotone_in_snr(self):
        x = _speechlike()
        scores = [stoi(x, _add_noise(x, snr), 16000) for snr in [30, 20, 10, 0, -10]]
        assert all(a > b for a, b in zip(scores, scores[1:])), scores
        assert all(0.0 <= s <= 1.0 for s in scores)

    def test_fs_8k_supported(self):
        x = _speechlike(fs=8000)
        assert stoi(x, x, 8000) == pytest.approx(1.0, abs=1e-6)
        assert stoi(x, _add_noise(x, 0), 8000) < 0.9

    def test_too_short_returns_nan(self):
        x = _speechlike(secs=0.2)
        assert np.isnan(stoi(x, x, 16000))

    def test_silent_frame_removal(self):
        # silence padding must not change the score materially (frames 40 dB
        # below the max are dropped before scoring)
        x = _speechlike()
        y = _add_noise(x, 10)
        pad = np.zeros(8000)
        a = stoi(x, y, 16000)
        b = stoi(np.concatenate([pad, x, pad]), np.concatenate([pad, y, pad]), 16000)
        assert a == pytest.approx(b, abs=0.03)


class TestPesq:
    def test_identity_anchors(self):
        """Zero disturbance maps through the published P.862.2/P.862.1
        logistics to the known identity outputs of the ITU implementation."""
        x = _speechlike()
        assert pesq(x, x, 16000) == pytest.approx(4.6439, abs=1e-3)
        x8 = _speechlike(fs=8000)
        assert pesq(x8, x8, 8000) == pytest.approx(4.5486, abs=1e-3)

    def test_monotone_in_snr_wb(self):
        x = _speechlike()
        scores = [pesq(x, _add_noise(x, snr), 16000) for snr in [40, 30, 20, 10, 0]]
        assert all(a > b for a, b in zip(scores, scores[1:])), scores
        # calibration envelope: heavy noise lands in the low-MOS region,
        # light noise near-transparent
        assert scores[0] > 4.2 and scores[-1] < 2.2

    def test_monotone_in_snr_nb(self):
        x = _speechlike(fs=8000)
        scores = [pesq(x, _add_noise(x, snr), 8000) for snr in [40, 30, 20, 10, 0]]
        assert all(a > b for a, b in zip(scores, scores[1:])), scores

    def test_level_invariance(self):
        """P.862 level alignment: a pure global gain is not a degradation."""
        x = _speechlike()
        assert pesq(x, 0.05 * x, 16000) == pytest.approx(pesq(x, x, 16000), abs=1e-9)
        assert pesq(x, 20.0 * x, 16000) == pytest.approx(pesq(x, x, 16000), abs=1e-9)

    def test_delay_mostly_recovered(self):
        x = _speechlike()
        shifted = np.concatenate([np.zeros(800), x])[: len(x)]  # +50 ms
        assert pesq(x, shifted, 16000) > 4.2

    def test_distortions_penalized(self):
        x = _speechlike()
        clipped = np.clip(x, -0.2, 0.2)
        assert pesq(x, clipped, 16000) < 3.5
        assert np.isnan(pesq(x[:1000], x[:1000], 16000))  # too short

    def test_bad_fs_rejected(self):
        x = _speechlike()
        with pytest.raises(ValueError):
            pesq(x, x, 44100)

    def test_range(self):
        x = _speechlike()
        rng = np.random.RandomState(3)
        pure_noise = rng.randn(len(x))
        v = pesq(x, pure_noise, 16000)
        assert 1.0 <= v <= 4.644


def test_metric_package_exports():
    from s3prl_tpu.metric import pesq as p, stoi as s

    assert p is pesq and s is stoi
