"""PaSST — patchout spectrogram transformer (HEAR flavor), native port.

Behavioral spec from the reference's vendored hear21passt
(s3prl/upstream/passt/):
- expert.py:12-39: 16 kHz input is sinc-resampled to 32 kHz, then timestamp
  embeddings are taken over 160 ms windows with a 50 ms hop;
- wrapper.py PasstBasicWrapper:77-120: windows are cut from a reflect-padded
  wav (pad = window//2) and each runs the mel front-end + PaSST net; in
  mode="all" the embedding is concat(logits[527], cls_features[768]) = 1295;
- models/preprocess.py AugmentMelSTFT:68-120 (eval path): pre-emphasis conv
  [-0.97, 1], torch.stft n_fft=1024 win=800 hop=320 hann(periodic=False)
  center+reflect, power spectrum, Kaldi mel banks (fmin 0, fmax
  sr/2 - fmax_aug_range/2), log(mel + 1e-5), (x + 4.5) / 5;
- models/passt.py PaSST:511-772: timm ViT with decomposed positional
  embeddings — freq_new_pos_embed [F_grid] + time_new_pos_embed[:T'] added on
  the patch grid, new_pos_embed on the cls token — pre-LN blocks, final
  LayerNorm, head = LayerNorm + Linear(527); patchout is train-only and not
  used for HEAR extraction.

The torchaudio 16->32 kHz resampler is reimplemented from torchaudio's
sinc_interp_hann polyphase formula (lowpass_filter_width=6, rolloff=0.99).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .transformer import EncoderLayer
from ..ops import audio as audio_ops

SR_IN = 16000
SR_MODEL = 32000


@dataclass(frozen=True)
class PasstConfig:
    n_mels: int = 128
    n_fft: int = 1024
    win_length: int = 800
    mel_hop: int = 320  # hop100/hop160 variants change this
    fmin: float = 0.0
    fmax: float = 15000.0  # sr/2 - fmax_aug_range/2 (preprocess.py:38-41)
    patch_size: int = 16
    fstride: int = 10
    tstride: int = 10
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    n_classes: int = 527
    input_fdim: int = 128
    input_tdim: int = 998  # positional-embedding time grid source
    timestamp_window_ms: float = 160.0
    timestamp_hop_ms: float = 50.0
    two_level: bool = False  # concat embeddings of (w, mult*w) windows
    two_level_mult: int = 5  # 5 everywhere except base2levelmel's 4
    include_mel: bool = False  # append raw-mel timestamp embeds (128*6)
    mel_ts_window: int = 0  # samples @32 kHz for the mel timestamp window

    # pos-embed grids use the reference's floor division (PatchEmbed
    # grid_size = img_size // stride, passt.py:416), not conv arithmetic
    @property
    def f_grid(self) -> int:
        return self.input_fdim // self.fstride

    @property
    def t_grid(self) -> int:
        return self.input_tdim // self.tstride

    @property
    def embedding_size(self) -> int:
        base = self.n_classes + self.embed_dim
        size = base * 2 if self.two_level else base
        if self.include_mel:
            size += self.n_mels * 6
        return size


PASST_BASE = PasstConfig()
PASST_HOP100 = PasstConfig(mel_hop=100, input_tdim=3200)
PASST_HOP160 = PasstConfig(mel_hop=160, input_tdim=2000)
PASST_20SEC = PasstConfig(input_tdim=2000)
PASST_30SEC = PasstConfig(input_tdim=3000)
PASST_2LVL = PasstConfig(two_level=True)
# the "mel" variants append get_timestamp_mels embeddings; mel window sized
# for exactly 6 STFT frames at the variant's hop (hear21passt
# base2levelmel.py:67 window=1920, hop100base2lvlmel.py window=6*100,
# hop160base2lvlmel.py window=6*160). base2levelmel's second level uses a
# 4x window (base2levelmel.py:70), the hop variants keep 5x.
PASST_2LVL_MEL = PasstConfig(two_level=True, two_level_mult=4,
                             include_mel=True, mel_ts_window=1920)
PASST_HOP100_2LVL = PasstConfig(mel_hop=100, input_tdim=3200, two_level=True)
PASST_HOP100_2LVL_MEL = PasstConfig(mel_hop=100, input_tdim=3200,
                                    two_level=True, include_mel=True,
                                    mel_ts_window=600)
PASST_HOP160_2LVL = PasstConfig(mel_hop=160, input_tdim=2000, two_level=True)
PASST_HOP160_2LVL_MEL = PasstConfig(mel_hop=160, input_tdim=2000,
                                    two_level=True, include_mel=True,
                                    mel_ts_window=960)


def resample_kernel(orig: int, new: int, lowpass_filter_width: int = 6,
                    rolloff: float = 0.99) -> np.ndarray:
    """torchaudio sinc_interp_hann polyphase kernel (functional.resample
    semantics): returns [new, taps] for reduced orig/new rates."""
    g = math.gcd(orig, new)
    orig, new = orig // g, new // g
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    idx = np.arange(-width, width + orig, dtype=np.float64) / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx[None]
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    t *= math.pi
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels *= window * (base_freq / orig)
    return kernels.astype(np.float32)  # [new, 2*width + orig]


def resample(wavs: jnp.ndarray, orig: int = SR_IN, new: int = SR_MODEL) -> jnp.ndarray:
    """Polyphase sinc resample [B, T] -> [B, ceil(T*new/orig)]."""
    g = math.gcd(orig, new)
    o, n = orig // g, new // g
    kern = resample_kernel(orig, new)
    width = (kern.shape[1] - o) // 2
    B, T = wavs.shape
    x = jnp.pad(wavs, ((0, 0), (width, width + o)))
    # conv with stride o, one output channel per phase
    lhs = x[:, None, :]  # [B, 1, T+...]
    rhs = jnp.asarray(kern)[:, None, :]  # [n, 1, taps]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(o,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, n, frames]
    out = out.transpose(0, 2, 1).reshape(B, -1)
    target = int(math.ceil(T * n / o))
    return out[:, :target]


def passt_mel(wavs32: jnp.ndarray, cfg: PasstConfig) -> jnp.ndarray:
    """AugmentMelSTFT eval path: [B, T] 32 kHz -> [B, n_mels, frames]."""
    x = wavs32[:, 1:] - 0.97 * wavs32[:, :-1]  # pre-emphasis conv [-0.97, 1]
    B, T = x.shape
    pad = cfg.n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    frames = audio_ops.frame_wavs(xp, cfg.n_fft, cfg.mel_hop)
    win = np.zeros(cfg.n_fft, np.float32)
    n = np.arange(cfg.win_length)
    # torch.hann_window(periodic=False): symmetric hann
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / (cfg.win_length - 1))
    start = (cfg.n_fft - cfg.win_length) // 2
    win[start : start + cfg.win_length] = hann.astype(np.float32)
    spec = jnp.abs(jnp.fft.rfft(frames * jnp.asarray(win), axis=-1)) ** 2
    banks = audio_ops.kaldi_mel_banks(
        cfg.n_mels, cfg.n_fft, sample_rate=SR_MODEL,
        low_freq=max(cfg.fmin, 1e-8), high_freq=cfg.fmax,
    )
    mel = jnp.einsum("mf,btf->bmt", jnp.asarray(banks), spec)
    mel = jnp.log(mel + 1e-5)
    return (mel + 4.5) / 5.0


class PasstNet(nn.Module):
    """mel [B, F, T] -> (logits[B, n_classes], cls_features[B, E])."""

    cfg: PasstConfig = PASST_BASE
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        B = mel.shape[0]
        x = mel[..., None]  # [B, F, T, 1]
        x = nn.Conv(
            cfg.embed_dim, kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.fstride, cfg.tstride), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x.astype(self.dtype))  # [B, F', T', E]
        Fp, Tp = x.shape[1], x.shape[2]

        freq_pos = self.param(
            "freq_pos_embed", nn.initializers.normal(0.02), (cfg.f_grid, cfg.embed_dim)
        )
        time_pos = self.param(
            "time_pos_embed", nn.initializers.normal(0.02), (cfg.t_grid, cfg.embed_dim)
        )
        x = x + freq_pos[None, :Fp, None, :].astype(x.dtype)
        x = x + time_pos[None, None, :Tp, :].astype(x.dtype)

        # flatten the (F, T) grid frequency-major, like torch flatten(2)
        x = x.reshape(B, Fp * Tp, cfg.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim))
        new_pos = self.param("new_pos_embed", nn.initializers.normal(0.02),
                             (1, 1, cfg.embed_dim))
        cls_tok = jnp.broadcast_to(
            (cls + new_pos).astype(x.dtype), (B, 1, cfg.embed_dim)
        )
        x = jnp.concatenate([cls_tok, x], axis=1)

        for i in range(cfg.depth):
            x = EncoderLayer(
                cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio), cfg.num_heads,
                layer_norm_first=True, dropout=0.0, attention_dropout=0.0,
                dtype=self.dtype, layer_norm_eps=1e-6, name=f"block_{i}",
            )(x, None, None, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        feats = x[:, 0]
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="head_norm")(feats).astype(self.dtype)
        logits = nn.Dense(cfg.n_classes, dtype=self.dtype, name="head")(h)
        return logits, feats


class PasstModel(nn.Module):
    """Full upstream: 16 kHz wavs -> hidden_states[1, B, n_ts, 1295(or 2590)]."""

    cfg: PasstConfig = PASST_BASE
    dtype: jnp.dtype = jnp.float32

    def _window_embeds(self, net, wav32, window, hop, deterministic):
        B, T32 = wav32.shape
        pad = window // 2
        xp = jnp.pad(wav32, ((0, 0), (pad, pad)), mode="reflect")
        n_ts = (T32 + 2 * pad - window) // hop + 1
        starts = jnp.arange(n_ts) * hop
        segs = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(xp, s, window, axis=1),
            out_axes=1,
        )(starts)  # [B, n_ts, window]
        segs = segs.reshape(B * n_ts, window)
        mel = passt_mel(segs, self.cfg)
        logits, feats = net(mel, deterministic)
        emb = jnp.concatenate([logits, feats], axis=-1)
        return emb.reshape(B, n_ts, -1), n_ts

    @nn.compact
    def __call__(self, wavs: jnp.ndarray, wav_lens: jnp.ndarray, deterministic=True):
        cfg = self.cfg
        wav32 = resample(wavs)
        window = int(cfg.timestamp_window_ms * SR_MODEL / 1000)
        hop = int(cfg.timestamp_hop_ms * SR_MODEL / 1000)
        net = PasstNet(cfg, self.dtype, name="net")
        emb, n_ts = self._window_embeds(net, wav32, window, hop, deterministic)
        if cfg.two_level:  # concat a mult*window pass (base2level.py:58-72)
            emb5, n5 = self._window_embeds(
                net, wav32, window * cfg.two_level_mult, hop, deterministic
            )
            n = min(n_ts, n5)
            emb = jnp.concatenate([emb[:, :n], emb5[:, :n]], axis=-1)
            n_ts = n
        if cfg.include_mel:  # get_timestamp_mels (wrapper.py:121-160)
            melw = cfg.mel_ts_window
            B, T32 = wav32.shape
            pad = melw // 2
            xp = jnp.pad(wav32, ((0, 0), (pad, pad)), mode="reflect")
            n_mel_ts = (T32 + 2 * pad - melw) // hop + 1
            starts = jnp.arange(n_mel_ts) * hop
            segs = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(xp, s, melw, axis=1),
                out_axes=1,
            )(starts).reshape(B * n_mel_ts, melw)
            mel = passt_mel(segs, cfg)  # [B*n, 128, 6]
            mel = mel.reshape(B, n_mel_ts, -1).astype(emb.dtype)
            n = min(n_ts, n_mel_ts)
            emb = jnp.concatenate([emb[:, :n], mel[:, :n]], axis=-1)
            n_ts = n
        out_lens = jnp.minimum(wav_lens * 2 // hop + 1, n_ts)
        return emb[None], out_lens
