"""AST family — spectrogram patch/frame transformers (AST / SSAST / MAE-AST).

Behavioral spec from the reference (s3prl/upstream/ssast/{expert.py,
ast_models.py}, upstream/ast): audio is cut into fixed windows (1 s for
SSAST), each window's 128-bin kaldi fbank is patchified by a strided 2-D
conv (16x16 patches at 10-stride for patch models; 128x2 frames for frame
models), a cls token + learned positional embeddings feed a pre-LN ViT; the
upstream hidden states are per-time-patch embeddings (mean over frequency
patches), windows concatenated in time. Downsample rate = 160 * tstride.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from .transformer import EncoderLayer
from ..ops import audio as audio_ops


@dataclass(frozen=True)
class ASTConfig:
    fshape: int = 16
    tshape: int = 16
    fstride: int = 10
    tstride: int = 10
    input_fdim: int = 128
    input_tdim: int = 100  # frames per window (1 s)
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0

    @property
    def f_patches(self) -> int:
        return (self.input_fdim - self.fshape) // self.fstride + 1

    @property
    def t_patches(self) -> int:
        return (self.input_tdim - self.tshape) // self.tstride + 1


SSAST_PATCH = ASTConfig()
SSAST_FRAME = ASTConfig(fshape=128, tshape=2, fstride=128, tstride=2)


class ASTEncoder(nn.Module):
    """One window: fbank[B, T, F] -> hidden_states[L+1, B, t_patches, D]."""

    cfg: ASTConfig = SSAST_PATCH
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fbank: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        B = fbank.shape[0]
        x = fbank[..., None]  # [B, T, F, 1]
        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.tshape, cfg.fshape),
            strides=(cfg.tstride, cfg.fstride),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)  # [B, t_patches, f_patches, D]
        tp, fp = x.shape[1], x.shape[2]
        x = x.reshape(B, tp * fp, cfg.embed_dim)

        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, cfg.embed_dim))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, tp * fp + 1, cfg.embed_dim)
        )
        x = jnp.concatenate([jnp.tile(cls.astype(x.dtype), (B, 1, 1)), x], axis=1) + pos.astype(x.dtype)

        hidden = [x]
        for i in range(cfg.depth):
            x = EncoderLayer(
                cfg.embed_dim,
                int(cfg.embed_dim * cfg.mlp_ratio),
                cfg.num_heads,
                layer_norm_first=True,
                dropout=0.0,
                attention_dropout=0.0,
                dtype=self.dtype,
                layer_norm_eps=1e-6,  # timm ViT
                name=f"block_{i}",
            )(x, None, None, deterministic)
            hidden.append(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        hidden[-1] = x

        # per-time-patch states: drop cls, mean over frequency patches
        hs = jnp.stack(hidden)  # [L+1, B, 1+tp*fp, D]
        hs = hs[:, :, 1:, :].reshape(len(hidden), B, tp, fp, cfg.embed_dim).mean(3)
        return hs  # [L+1, B, tp, D]


def ast_windows_forward(model, params, wavs, wav_lens, cfg: ASTConfig, deterministic=True):
    """Window the wav into input_tdim-frame fbank chunks and concat patches."""
    fbank, mel_lens = audio_ops.fbank(
        wavs, wav_lens, num_mel_bins=cfg.input_fdim, frame_shift=10.0
    )
    B, T, F = fbank.shape
    # ceil-window: the reference zero-pads the last window to the fixed
    # input_tdim (ssast/expert.py chunks 1 s windows and pads the tail);
    # flooring dropped sub-window audio entirely and broke wavs shorter
    # than one window (98-frame fbank for a 1 s wav vs input_tdim=100)
    W = max(-(-T // cfg.input_tdim), 1)
    if T < W * cfg.input_tdim:
        fbank = jnp.pad(fbank, ((0, 0), (0, W * cfg.input_tdim - T), (0, 0)))
    fb = fbank[:, : W * cfg.input_tdim].reshape(B * W, cfg.input_tdim, F)
    hs = model.apply({"params": params}, fb, deterministic=deterministic)
    L, _, tp, D = hs.shape
    hs = hs.reshape(L, B, W * tp, D)
    out_lens = jnp.maximum((wav_lens - 1) // (160 * cfg.tstride) + 1, 1)
    return hs, jnp.minimum(out_lens, W * tp)
