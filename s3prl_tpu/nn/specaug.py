"""On-device SpecAugment.

Behavioral spec from the reference's SpecAug (s3prl/nn/specaug.py:26-207 and
the legacy copy at downstream/specaug.py): random time/frequency band masking
(and optional time warp) applied to features during training only.

TPU-first: fully static shapes — masks are built with broadcasted iota
against uniformly sampled (start, width) pairs, so the whole augmentation is
a handful of vector ops fused into the surrounding computation; no
data-dependent shapes, no host RNG.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _band_mask(key, B: int, L: int, num_masks: int, max_width: int) -> jnp.ndarray:
    """[B, L] bool — union of `num_masks` random bands of width <= max_width."""
    k1, k2 = jax.random.split(key)
    widths = jax.random.randint(k1, (B, num_masks), 0, max_width + 1)  # [B, M]
    starts = (
        jax.random.uniform(k2, (B, num_masks))
        * jnp.maximum(L - widths, 1).astype(jnp.float32)
    ).astype(jnp.int32)
    pos = jnp.arange(L)[None, None, :]
    hit = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
    return jnp.any(hit, axis=1)


def specaug(
    key: jax.Array,
    feats: jnp.ndarray,  # [B, T, D]
    feat_lens: Optional[jnp.ndarray] = None,
    *,
    freq_mask_num: int = 2,
    freq_mask_width: int = 27,
    time_mask_num: int = 2,
    time_mask_width: int = 100,
    mask_value: float = 0.0,
) -> jnp.ndarray:
    """Apply frequency + time masking. Defaults follow the reference's
    SpecAug LibriSpeech policy (nn/specaug.py)."""
    B, T, D = feats.shape
    kf, kt = jax.random.split(key)
    fmask = _band_mask(kf, B, D, freq_mask_num, freq_mask_width)  # [B, D]
    tmask = _band_mask(kt, B, T, time_mask_num, time_mask_width)  # [B, T]
    if feat_lens is not None:  # never mask beyond the valid region's scale
        tmask = tmask & (jnp.arange(T)[None, :] < feat_lens[:, None])
    out = jnp.where(fmask[:, None, :], mask_value, feats)
    out = jnp.where(tmask[:, :, None], mask_value, out)
    return out


class SpecAug:
    """Callable config bundle: `SpecAug()(key, feats, lens)`."""

    def __init__(
        self,
        freq_mask_num: int = 2,
        freq_mask_width: int = 27,
        time_mask_num: int = 2,
        time_mask_width: int = 100,
    ):
        self.kwargs = dict(
            freq_mask_num=freq_mask_num,
            freq_mask_width=freq_mask_width,
            time_mask_num=time_mask_num,
            time_mask_width=time_mask_width,
        )

    def __call__(self, key, feats, feat_lens=None):
        return specaug(key, feats, feat_lens, **self.kwargs)


def time_warp(key: jax.Array, feats: jnp.ndarray, warp_window: int = 5) -> jnp.ndarray:
    """Two-segment linear time warp (reference: nn/specaug.py time_warp /
    mockingjay builder spec_augment): a random anchor near the center moves
    by up to +-warp_window frames; frames are linearly re-interpolated.
    Static shapes: per-utterance index maps + gather with interpolation.
    """
    B, T, D = feats.shape
    if T <= 2 * warp_window + 2:
        return feats
    k1, k2 = jax.random.split(key)
    center = jax.random.randint(k1, (B,), warp_window + 1, T - warp_window - 1)
    shift = jax.random.randint(k2, (B,), -warp_window, warp_window + 1)
    src_center = (center + shift).astype(jnp.float32)
    t = jnp.arange(T, dtype=jnp.float32)[None, :]
    c = center.astype(jnp.float32)[:, None]
    sc = src_center[:, None]
    # piecewise-linear source index: [0, c]->[0, sc], [c, T-1]->[sc, T-1]
    left = t / jnp.maximum(c, 1.0) * sc
    right = sc + (t - c) / jnp.maximum((T - 1) - c, 1.0) * ((T - 1) - sc)
    src = jnp.where(t <= c, left, right)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, T - 1)
    hi = jnp.clip(lo + 1, 0, T - 1)
    frac = (src - lo.astype(jnp.float32))[..., None]
    gather = lambda idx: jnp.take_along_axis(feats, idx[..., None].repeat(D, -1), axis=1)
    return gather(lo) * (1.0 - frac) + gather(hi) * frac
