"""First-party STOI / PESQ regression tests (metric/quality.py).

No oracle packages exist in this environment (pystoi / the ITU P.862 C
binding are absent, no egress), so the contract pinned here is:
- the P.862 perceptual-model tables are SELF-VALIDATING and validated here
  at full precision: the Hz-bin partition sums exactly to the FFT bins,
  band centres satisfy the band-edge recursion against the width table,
  and every absolute-threshold power is an exact 0.1-dB decade — three
  independent structural invariants of the published tables that a
  misremembered entry would break;
- exact identity anchors: the published identity outputs of the reference
  implementations (pesq wb 4.6439 / nb 4.5486 come straight from the
  P.862.2/P.862.1 logistic maps at zero disturbance; stoi identity = 1.0);
- strict monotonicity in SNR over the model-selection range and absolute
  AWGN scores inside the ITU tool's known envelope;
- the P.862 invariances (global gain, small delay).
"""

import numpy as np
import pytest

from s3prl_tpu.metric.quality import pesq, pesq_analytic, stoi


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


class TestP862Tables:
    """Structural invariants of the published P.862 tables — all three
    must hold simultaneously, which a misrecalled entry would break."""

    def test_bin_partition_covers_fft_exactly(self):
        from s3prl_tpu.metric.quality import _P862_NR_HZ, _p862_geometry

        assert len(_P862_NR_HZ) == 49 and int(_P862_NR_HZ.sum()) == 256
        nf, nb, nr, w, c, t = _p862_geometry(8000)
        assert nf == 256 and nb == 42 and int(nr.sum()) == 128
        assert nr[41] == 11  # the truncation-derived final nb band

    def test_centres_match_width_recursion(self):
        from s3prl_tpu.metric.quality import _P862_CENTRE_BARK, _P862_WIDTH_BARK

        c = [_P862_WIDTH_BARK[0] / 2.0]
        for i in range(48):
            c.append(c[-1] + (_P862_WIDTH_BARK[i] + _P862_WIDTH_BARK[i + 1]) / 2)
        err = np.max(np.abs(np.asarray(c) - _P862_CENTRE_BARK))
        assert err < 5e-6, err  # tables published to 6 decimals

    def test_thresholds_are_tenth_db_decades(self):
        from s3prl_tpu.metric.quality import _P862_ABS_THRESH

        # published floats: 51286152.0, 2454709.5, ..., 0.537032 — each an
        # exact 10^(k/10); spot-pin the endpoints and a mid-band value
        assert _P862_ABS_THRESH[0] == pytest.approx(51286152.0, rel=2e-6)
        assert _P862_ABS_THRESH[3] == pytest.approx(4897.788574, rel=2e-6)
        assert _P862_ABS_THRESH[23] == pytest.approx(0.251189, rel=2e-6)
        assert _P862_ABS_THRESH[48] == pytest.approx(0.537032, rel=2e-6)

    def test_correction_factors_match_published(self):
        # pow_dens_correction_factor = 100/nr (published floats are exactly
        # this, e.g. last band 5.000000 = 100/20)
        from s3prl_tpu.metric.quality import _P862_NR_HZ

        corr = 100.0 / _P862_NR_HZ
        assert corr[0] == 100.0 and corr[8] == 50.0
        assert corr[48] == 5.0 and corr[47] == 4.0


class TestPesqAnalyticFallback:
    def test_identity_and_monotone(self):
        x = _speechlike()
        assert pesq_analytic(x, x, 16000) == pytest.approx(4.6439, abs=1e-3)
        scores = [pesq_analytic(x, _add_noise(x, snr), 16000)
                  for snr in [30, 10]]
        assert scores[0] > scores[1]


def test_metric_package_exports():
    from s3prl_tpu.metric import pesq as p, stoi as s

    assert p is pesq and s is stoi
