"""BYOL-A / BYOL-S — AudioNTT2020 CNN embeddings, native port.

Behavioral spec from the reference:
- the network (vendored twice: s3prl/upstream/byol_a/byol_a.py:89-140 and
  s3prl/upstream/byol_s/byol_a/models/audio_ntt.py): three Conv2d(3x3, pad 1)
  + BatchNorm + ReLU + MaxPool(2x2) blocks over the [mel, time] plane, then
  per-time-step MLP (Linear(64*n_mels/8 -> d), ReLU, Dropout, Linear(d, d),
  ReLU) and a temporal mean+amax summary per window;
- BYOL-A upstream (byol_a/expert.py:28-130): non-overlapping 1 s windows
  (stride_secs=1), log-MelSpectrogram (n_fft 1024, win 1024, hop 160,
  64 mels, 60-7800 Hz), fixed PrecomputedNorm stats (-5.4919195, 5.0389895);
- BYOL-S upstream (byol_s/serab_byols/serab.py:106-172, utils.py:50-101):
  1 s windows every 50 ms cut from a wav zero-padded by frame_size//2 /
  frame_size-frame_size//2, log-MelSpectrogram (win 400), and batch-computed
  norm stats with the reference's 1/N quirk (utils.py:40-47: mean and std
  are divided by the number of frames after reduction).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import audio as audio_ops

SAMPLE_RATE = 16000
EPS = float(np.finfo(np.float32).eps)


@dataclass(frozen=True)
class ByolConfig:
    n_mels: int = 64
    feature_d: int = 2048
    n_fft: int = 1024
    win_length: int = 1024  # byol_s uses 400
    hop_length: int = 160
    f_min: float = 60.0
    f_max: float = 7800.0
    window_secs: float = 1.0
    stride_secs: float = 1.0  # byol_s: 0.05
    # normalization: fixed stats (byol_a) or batch stats w/ 1/N quirk (byol_s)
    norm_stats: tuple = (-5.4919195, 5.0389895)
    batch_norm_stats: bool = False
    # window encoder: AudioNTT2020 ("ntt"), ResNetish-34 or CvT (the
    # serab_byols byol_s variants, serab.py:43-67)
    encoder: str = "ntt"


BYOL_A_2048 = ByolConfig()
BYOL_A_1024 = ByolConfig(feature_d=1024)
BYOL_A_512 = ByolConfig(feature_d=512)
BYOL_S_DEFAULT = ByolConfig(
    win_length=400, stride_secs=0.05, batch_norm_stats=True
)
BYOL_S_RESNETISH34 = ByolConfig(
    win_length=400, stride_secs=0.05, batch_norm_stats=True,
    encoder="resnetish34",
)
BYOL_S_CVT = ByolConfig(
    win_length=400, stride_secs=0.05, batch_norm_stats=True, encoder="cvt",
)


class AudioNTT2020(nn.Module):
    """[B, F(n_mels), T] normalized log-mel -> [B, d] (one window)."""

    n_mels: int = 64
    d: int = 2048

    @nn.compact
    def __call__(self, mel: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = mel[..., None]  # [B, F, T, 1]
        for i in range(3):
            x = nn.Conv(64, (3, 3), padding="SAME", name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=True, name=f"bn_{i}")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        B, Fp, Tp, C = x.shape
        # torch permute(0,3,2,1).reshape: time-major rows, (mel, ch) flattened
        # mel-major (audio_ntt.py:36-40)
        x = x.transpose(0, 2, 1, 3).reshape(B, Tp, Fp * C)
        x = nn.relu(nn.Dense(self.d, name="fc1")(x))
        x = nn.Dropout(0.3)(x, deterministic=deterministic)
        x = nn.relu(nn.Dense(self.d, name="fc2")(x))
        return x.mean(axis=1) + x.max(axis=1)  # mean + amax over time


class _BasicBlock(nn.Module):
    """ResNet BasicBlock, eval-mode BN (reference: byol_s/byol_a/models/
    resnetish.py:56-105)."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        idt = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn2")(y)
        if self.downsample:
            idt = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                          use_bias=False, name="down_conv")(x)
            idt = nn.BatchNorm(use_running_average=True, name="down_bn")(idt)
        return nn.relu(y + idt)


class ResNetish34(nn.Module):
    """resnetish34 window encoder (resnetish.py:176-312,384-399): 7x7 stem
    (stride 1) + maxpool 3x3/2 + BasicBlock stages [3,4,6,3], then the
    BYOL-A mean+amax over time with (mel, ch) flattened."""

    @nn.compact
    def __call__(self, mel: jnp.ndarray, deterministic: bool = True):
        x = mel[..., None]  # [B, F, T, 1]
        x = nn.Conv(64, (7, 7), padding=((3, 3), (3, 3)), use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        inplanes = 64
        for li, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        ):
            for b in range(blocks):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or inplanes != planes)
                x = _BasicBlock(planes, s, down, name=f"layer{li + 1}_{b}")(x)
            inplanes = planes
        B, Fp, Tp, C = x.shape
        x = x.transpose(0, 2, 1, 3).reshape(B, Tp, Fp * C)
        return x.mean(axis=1) + x.max(axis=1)


class _CvtLayerNorm(nn.Module):
    """CvT channel LayerNorm: biased std, eps added to the STD (cvt.py:40-53)."""

    dim: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        g = self.param("g", nn.initializers.ones, (self.dim,))
        b = self.param("b", nn.initializers.zeros, (self.dim,))
        mean = x.mean(axis=-1, keepdims=True)
        std = jnp.sqrt(((x - mean) ** 2).mean(axis=-1, keepdims=True))
        return (x - mean) / (std + 1e-5) * g + b


class _DepthWiseConv2d(nn.Module):
    """depthwise conv + BN + pointwise conv (cvt.py:86-105)."""

    dim_out: int
    kernel: int
    stride: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        dim_in = x.shape[-1]
        p = self.kernel // 2
        x = nn.Conv(dim_in, (self.kernel,) * 2, strides=(self.stride,) * 2,
                    padding=((p, p), (p, p)), feature_group_count=dim_in,
                    use_bias=self.use_bias, name="dw")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn")(x)
        return nn.Conv(self.dim_out, (1, 1), use_bias=self.use_bias, name="pw")(x)


class _CvtAttention(nn.Module):
    """conv-projection attention over the (H, W) token grid (cvt.py:108-152)."""

    dim: int
    heads: int
    proj_kernel: int = 3
    kv_stride: int = 2
    dim_head: int = 64

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        inner = self.heads * self.dim_head
        q = _DepthWiseConv2d(inner, self.proj_kernel, 1, False, name="to_q")(x)
        kv = _DepthWiseConv2d(inner * 2, self.proj_kernel, self.kv_stride,
                              False, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        B, H, W, _ = q.shape

        def split_heads(t):
            b, h, w, c = t.shape
            return t.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
        scores = jnp.einsum("bhid,bhjd->bhij", qh, kh) * (self.dim_head ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", probs, vh)  # [B, heads, HW, dh]
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, inner)
        return nn.Conv(self.dim, (1, 1), name="to_out")(out)


class _CvtFeedForward(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim * self.mult, (1, 1), name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        return nn.Conv(self.dim, (1, 1), name="fc2")(y)


class CvT(nn.Module):
    """CvT window encoder, serab_byols shape (config.yaml: depths [1,1,1],
    embed_dims [64,256,512], heads [1,3,6], pool mean+max; cvt.py:199-323)."""

    stages: tuple = ((64, 7, 4, 1, 1), (256, 3, 2, 3, 1), (512, 3, 2, 6, 1))
    # (emb_dim, emb_kernel, emb_stride, heads, depth) per stage

    @nn.compact
    def __call__(self, mel: jnp.ndarray, deterministic: bool = True):
        x = mel[..., None]  # [B, F, T, 1]
        for si, (dim, k, s, heads, depth) in enumerate(self.stages):
            p = k // 2
            x = nn.Conv(dim, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                        name=f"s{si}_embed")(x)
            x = _CvtLayerNorm(dim, name=f"s{si}_ln")(x)
            for d in range(depth):
                x = x + _CvtAttention(dim, heads, name=f"s{si}_attn{d}")(
                    _CvtLayerNorm(dim, name=f"s{si}_attn{d}_norm")(x)
                )
                x = x + _CvtFeedForward(dim, name=f"s{si}_ff{d}")(
                    _CvtLayerNorm(dim, name=f"s{si}_ff{d}_norm")(x)
                )
        B, Fp, Tp, C = x.shape
        x = x.transpose(0, 2, 1, 3).reshape(B, Tp, Fp * C)
        return x.mean(axis=1) + x.max(axis=1)


def byol_encoder(cfg: ByolConfig, name: str = "net") -> nn.Module:
    if cfg.encoder == "resnetish34":
        return ResNetish34(name=name)
    if cfg.encoder == "cvt":
        return CvT(name=name)
    return AudioNTT2020(cfg.n_mels, cfg.feature_d, name=name)


def byol_embedding_size(cfg: ByolConfig) -> int:
    if cfg.encoder in ("resnetish34", "cvt"):
        # 512 channels x (n_mels reduced 16x) frequency bins
        return 512 * (cfg.n_mels // 16)
    return cfg.feature_d


def _log_mel(wavs: jnp.ndarray, cfg: ByolConfig) -> jnp.ndarray:
    """torchaudio MelSpectrogram (power 2, htk mel, center reflect) + log."""
    spec, _ = audio_ops.stft_spectrogram(
        wavs, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
        win_length=cfg.win_length, power=2.0,
    )  # [B, T', n_fft//2+1]
    fb = audio_ops.mel_scale_matrix(
        cfg.n_fft // 2 + 1, cfg.n_mels, SAMPLE_RATE, cfg.f_min, cfg.f_max
    )
    mel = jnp.einsum("btf,fm->bmt", spec, jnp.asarray(fb))
    return jnp.log(mel + EPS)


class ByolModel(nn.Module):
    """Windowed upstream: wavs[B, T] -> hidden_states[1, B, n_win, d]."""

    cfg: ByolConfig = BYOL_A_2048

    @nn.compact
    def __call__(self, wavs: jnp.ndarray, wav_lens: jnp.ndarray, deterministic=True):
        cfg = self.cfg
        B, T = wavs.shape
        window = int(cfg.window_secs * SAMPLE_RATE)
        step = int(cfg.stride_secs * SAMPLE_RATE)

        if cfg.batch_norm_stats:
            # BYOL-S frame_audio: pad window//2 front, window-window//2 back
            # (utils.py:70-74); frames while end <= padded length
            xp = jnp.pad(wavs, ((0, 0), (window // 2, window - window // 2)))
            n_win = T // step + 1
        else:
            # BYOL-A: non-overlapping windows from the start, zero-padded tail
            # (expert.py:84-91)
            starts_count = len(range(0, T, step))
            pad_to = (starts_count - 1) * step + window
            xp = jnp.pad(wavs, ((0, 0), (0, max(pad_to - T, 0))))
            n_win = starts_count

        starts = jnp.arange(n_win) * step
        segs = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(xp, s, window, axis=1),
            out_axes=1,
        )(starts).reshape(B * n_win, window)

        mel = _log_mel(segs, cfg)  # [B*n_win, n_mels, T']
        if cfg.batch_norm_stats:
            n = mel.shape[0]
            mean = mel.mean() / n  # the reference's 1/N quirk (utils.py:40-47)
            std = jnp.std(mel, ddof=1) / n
            mel = (mel - mean) / std
        else:
            mean, std = cfg.norm_stats
            mel = (mel - mean) / std

        emb = byol_encoder(cfg)(mel, deterministic=deterministic)
        emb = emb.reshape(B, n_win, byol_embedding_size(cfg))
        if cfg.batch_norm_stats:
            # BYOL-S center-padded framing: l//step + 1 frames
            out_lens = jnp.minimum(wav_lens // step + 1, n_win)
        else:
            # BYOL-A non-overlapping windows: the reference trims only to
            # len(range(0, max_wav_len, stride)) (expert.py:122-125) and the
            # packaged API applies the standard (l-1)//stride + 1 rule —
            # an exact-multiple wav must NOT count an extra padding window
            out_lens = jnp.minimum((wav_lens - 1) // step + 1, n_win)
        return emb[None], out_lens
