"""First-party FLAC decoder (native/flac_decode.cc) tests.

Roundtrips through the in-tree minimal writer (fixed+rice / verbatim
subframes, real CRCs) cover the container, rice coding and fixed
predictors; handcrafted streams cover constant / LPC subframes and the
left-side / mid-side stereo decorrelation modes.
"""

import numpy as np
import pytest

from s3prl_tpu.data.flac import _BitWriter, _crc8, _crc16, flac_info, load_flac, write_flac


def _roundtrip(tmp_path, samples, sr=16000, bps=16, block_size=256):
    path = tmp_path / "x.flac"
    write_flac(path, samples, sr, bps=bps, block_size=block_size)
    decoded, got_sr, got_bps = load_flac(path)
    assert got_sr == sr and got_bps == bps
    ref = np.asarray(samples)
    if ref.ndim == 1:
        ref = ref[:, None]
    np.testing.assert_array_equal(decoded, ref)


def test_flac_roundtrip_mono(tmp_path):
    rng = np.random.RandomState(0)
    t = np.arange(2000)
    wav = (np.sin(t * 0.05) * 8000 + rng.randn(2000) * 50).astype(np.int32)
    _roundtrip(tmp_path, wav)


def test_flac_roundtrip_stereo_multiblock(tmp_path):
    rng = np.random.RandomState(1)
    wav = (rng.randn(1000, 2) * 3000).astype(np.int32)
    _roundtrip(tmp_path, wav, block_size=192)


def test_flac_roundtrip_verbatim_extremes(tmp_path):
    # white noise at near-full-scale forces the verbatim fallback
    rng = np.random.RandomState(2)
    wav = rng.randint(-32768, 32767, size=500).astype(np.int32)
    _roundtrip(tmp_path, wav, block_size=128)


def test_flac_info(tmp_path):
    wav = np.zeros(1234, np.int32)
    path = tmp_path / "z.flac"
    write_flac(path, wav, 22050, bps=16)
    info = flac_info(path)
    assert info["sample_rate"] == 22050
    assert info["num_frames"] == 1234
    assert info["num_channels"] == 1


def test_load_wav_routes_flac(tmp_path):
    from s3prl_tpu.data.audio import audio_info, load_wav

    rng = np.random.RandomState(3)
    wav_i = (rng.randn(800) * 1000).astype(np.int32)
    path = tmp_path / "a.flac"
    write_flac(path, wav_i, 16000)
    wav, sr = load_wav(path)
    assert sr == 16000
    np.testing.assert_allclose(wav, wav_i / 32768.0, atol=1e-6)
    assert audio_info(path)["num_frames"] == 800


def _handcrafted(tmp_path, name, channels, ch_code, write_subframes, n=64,
                 bps=16, sr=16000):
    """Emit one frame with custom subframes; returns the decoded array."""
    head = _BitWriter()
    head.bytes += b"fLaC"
    head.write(1, 1)
    head.write(0, 7)
    head.write(34, 24)
    head.write(n, 16)
    head.write(n, 16)
    head.write(0, 24)
    head.write(0, 24)
    head.write(sr, 20)
    head.write(channels - 1, 3)
    head.write(bps - 1, 5)
    head.write(n, 36)
    for _ in range(16):
        head.write(0, 8)

    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)  # 16-bit blocksize field
    w.write(0, 4)
    w.write(ch_code, 4)
    w.write(0, 4)  # sample size from STREAMINFO + reserved
    w.write(0, 8)  # frame number 0
    w.write(n - 1, 16)
    w.write(_crc8(bytes(w.bytes)), 8)
    write_subframes(w)
    w.align()
    w.write(_crc16(bytes(w.bytes)), 16)

    path = tmp_path / f"{name}.flac"
    path.write_bytes(bytes(head.bytes) + bytes(w.bytes))
    decoded, got_sr, got_bps = load_flac(path)
    assert decoded.shape == (n, channels)
    return decoded


def test_flac_constant_subframe(tmp_path):
    def subframes(w):
        w.write(0, 1)   # pad
        w.write(0, 6)   # CONSTANT
        w.write(0, 1)   # no wasted bits
        w.write(-1234 & 0xFFFF, 16)

    out = _handcrafted(tmp_path, "const", 1, 0, subframes)
    assert (out[:, 0] == -1234).all()


def test_flac_lpc_subframe(tmp_path):
    # order-2 LPC: coefs [3, -1], shift 1 -> pred = (3*s1 - s2) >> 1
    n = 64
    rng = np.random.RandomState(4)
    res = rng.randint(-10, 10, size=n).astype(np.int64)
    s = np.zeros(n, np.int64)
    s[0], s[1] = 100, -50
    for i in range(2, n):
        s[i] = res[i] + ((3 * s[i - 1] - 1 * s[i - 2]) >> 1)

    def subframes(w):
        w.write(0, 1)
        w.write(32 + 1, 6)  # LPC order 2 (0b100000 | (order-1))
        w.write(0, 1)
        w.write(int(s[0]) & 0xFFFF, 16)
        w.write(int(s[1]) & 0xFFFF, 16)
        w.write(14, 4)      # precision 15
        w.write(1, 5)       # shift 1
        w.write(3 & 0x7FFF, 15)
        w.write(-1 & 0x7FFF, 15)
        # verbatim-ish residual: rice param large enough
        w.write(0, 2)
        w.write(0, 4)
        w.write(6, 4)
        for v in res[2:]:
            u = int(2 * abs(v) - (v < 0))
            w.write(0, u >> 6)
            w.write(1, 1)
            w.write(u, 6)

    out = _handcrafted(tmp_path, "lpc", 1, 0, subframes)
    np.testing.assert_array_equal(out[:, 0], s)


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_flac_stereo_decorrelation(tmp_path, mode):
    n = 64
    rng = np.random.RandomState(5)
    left = rng.randint(-5000, 5000, size=n).astype(np.int64)
    right = rng.randint(-5000, 5000, size=n).astype(np.int64)
    side = left - right
    if mode == "left_side":
        ch_code, ch0, ch1, bits0, bits1 = 8, left, side, 16, 17
    elif mode == "right_side":
        ch_code, ch0, ch1, bits0, bits1 = 9, side, right, 17, 16
    else:
        mid = (left + right) >> 1
        ch_code, ch0, ch1, bits0, bits1 = 10, mid, side, 16, 17

    def subframes(w):
        for data, bits in ((ch0, bits0), (ch1, bits1)):
            w.write(0, 1)
            w.write(1, 6)  # VERBATIM
            w.write(0, 1)
            for v in data:
                w.write(int(v) & ((1 << bits) - 1), bits)

    out = _handcrafted(tmp_path, mode, 2, ch_code, subframes)
    np.testing.assert_array_equal(out[:, 0], left)
    np.testing.assert_array_equal(out[:, 1], right)


def test_flac_final_single_sample_block(tmp_path):
    """A final block of exactly 1 sample uses a FIXED order-0 subframe whose
    residual must contain the sample (regression: it was emitted empty)."""
    rng = np.random.RandomState(5)
    wav = (rng.randn(257) * 1000).astype(np.int32)  # 256-block + 1 leftover
    _roundtrip(tmp_path, wav, block_size=256)


def test_flac_info_large_metadata_block(tmp_path):
    """flac_info must read STREAMINFO even when later metadata blocks push
    the header past the 64 KB probe read (e.g. embedded PICTURE blocks)."""
    path = tmp_path / "x.flac"
    wav = (np.random.RandomState(6).randn(1000) * 1000).astype(np.int32)
    write_flac(path, wav, 16000, block_size=256)
    raw = bytearray(path.read_bytes())
    # clear STREAMINFO's last-metadata flag, then splice in a 100 KB PADDING
    # block (type 1, last=1) right after STREAMINFO (offset 4+4+34)
    assert raw[4] == 0x80
    raw[4] = 0x00
    pad_len = 100 * 1024
    pad = bytes([0x81]) + pad_len.to_bytes(3, "big") + bytes(pad_len)
    raw2 = raw[:42] + pad + raw[42:]
    path2 = tmp_path / "meta.flac"
    path2.write_bytes(bytes(raw2))
    info = flac_info(path2)
    assert info["num_frames"] == 1000 and info["sample_rate"] == 16000
    decoded, sr, _ = load_flac(path2)
    np.testing.assert_array_equal(decoded[:, 0], wav)


def test_flac_unknown_total_samples(tmp_path):
    """total_samples=0 (streamed encoders) must not truncate the decode —
    the capacity fallback grows until the whole stream fits."""
    path = tmp_path / "x.flac"
    # constant-ish signal compresses far better than the 2x fallback bound
    wav = np.zeros(200_000, np.int32)
    wav[::3] = 100
    write_flac(path, wav, 16000, block_size=4096)
    raw = bytearray(path.read_bytes())
    # zero the 36-bit total_samples field (low nibble of STREAMINFO byte 13
    # + bytes 14..17; STREAMINFO payload starts at file offset 8)
    raw[8 + 13] &= 0xF0
    for i in range(14, 18):
        raw[8 + i] = 0
    path2 = tmp_path / "unknown.flac"
    path2.write_bytes(bytes(raw))
    assert flac_info(path2)["num_frames"] == 0
    decoded, sr, _ = load_flac(path2)
    np.testing.assert_array_equal(decoded[:, 0], wav)
