"""Baseline acoustic front-end upstreams (fbank / mfcc / spectrogram / mel).

Behavioral spec from the reference's baseline upstream
(s3prl/upstream/baseline/extracter.py:32-98 + fbank.yaml/mfcc.yaml...):
kaldi-style feature extraction + optional deltas + per-utterance CMVN,
exposed as a single-"layer" upstream whose downsample rate comes from the
frame shift. Parameter-free and fully jittable.
"""

from __future__ import annotations


import jax.numpy as jnp

from ..ops import audio

SAMPLE_RATE = 16000

# config-name -> kwargs mirroring the reference's yaml files
BASELINE_CONFIGS = {
    "fbank": dict(feat_type="fbank", num_mel_bins=80, delta_order=2, cmvn=True),
    "fbank_no_cmvn": dict(feat_type="fbank", num_mel_bins=80, delta_order=0, cmvn=False),
    "mfcc": dict(feat_type="mfcc", num_ceps=13, delta_order=2, cmvn=True),
    "spectrogram": dict(feat_type="spectrogram", delta_order=0, cmvn=True),
    "mel": dict(feat_type="mel", n_mels=80, delta_order=0, cmvn=True),
    "linear": dict(feat_type="linear", delta_order=0, cmvn=True),
}


def baseline_features(
    wavs: jnp.ndarray,
    wav_lens: jnp.ndarray,
    *,
    feat_type: str = "fbank",
    num_mel_bins: int = 80,
    num_ceps: int = 13,
    n_mels: int = 80,
    frame_length: float = 25.0,
    frame_shift: float = 10.0,
    delta_order: int = 0,
    delta_win_length: int = 5,
    cmvn: bool = True,
):
    """Returns (feats[B, F, D], feat_lens[B])."""
    if feat_type == "fbank":
        feats, feat_lens = audio.fbank(
            wavs, wav_lens, num_mel_bins=num_mel_bins,
            frame_length=frame_length, frame_shift=frame_shift,
        )
    elif feat_type == "mfcc":
        feats, feat_lens = audio.mfcc(
            wavs, wav_lens, num_ceps=num_ceps,
            frame_length=frame_length, frame_shift=frame_shift,
        )
    elif feat_type == "spectrogram":
        feats, feat_lens = audio.spectrogram(
            wavs, wav_lens, frame_length=frame_length, frame_shift=frame_shift
        )
    elif feat_type == "mel":
        feats, feat_lens = audio.log_mel(wavs, wav_lens, n_mels=n_mels)
    elif feat_type == "linear":
        spec, feat_lens = audio.stft_spectrogram(wavs, wav_lens)
        feats = jnp.log(spec + 1e-10)
    else:
        raise ValueError(f"unknown feat_type {feat_type}")

    if delta_order > 0:
        feats = audio.add_deltas(feats, delta_order, delta_win_length)
    if cmvn:
        feats = audio.cmvn(feats, feat_lens)
    return feats, feat_lens


def make_baseline_apply(config_name: str = "fbank", **overrides):
    """Build an upstream apply_fn for a named baseline config."""
    cfg = dict(BASELINE_CONFIGS[config_name], **overrides)
    frame_shift = cfg.get("frame_shift", 10.0)
    stride = int(frame_shift * SAMPLE_RATE / 1000)

    def apply_fn(params, wavs, wav_lens, train=False, rngs=None):
        feats, feat_lens = baseline_features(wavs, wav_lens, **cfg)
        return feats[None], feat_lens  # single "layer": [1, B, F, D]

    return apply_fn, stride
