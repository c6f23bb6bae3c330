"""Masked Acoustic Modeling (MAM) mask generation — on-device.

Behavioral spec from the reference's mask generation (s3prl/pretrain/
mockingjay/dataset.py + upstream/mockingjay/mam.py semantics, configured by
pretrain/*/config_model.yaml `task:` blocks): mask ~15% of frames in spans
of `mask_consecutive` frames; of the selected frames 80% are zeroed, 10%
replaced with a random frame from the same utterance, 10% kept; optionally
mask a band of frequency bins (TERA). The reference does this in DataLoader
workers on CPU — here it is a jitted transform (static shapes, jax PRNG).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mam_mask(
    key: jax.Array,
    feats: jnp.ndarray,  # [B, T, D]
    feat_lens: jnp.ndarray,  # [B]
    mask_proportion: float = 0.15,
    mask_consecutive: int = 7,
    mask_frequency: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (masked_feats[B,T,D], label_mask[B,T] bool True=predict)."""
    B, T, D = feats.shape
    k_span, k_mode, k_rand, k_freq, k_fwidth = jax.random.split(key, 5)

    # -- time spans -----------------------------------------------------
    n_spans = max(int(T * mask_proportion / max(mask_consecutive, 1)), 1)
    valid_starts = jnp.maximum(feat_lens - mask_consecutive, 1)
    starts = (
        jax.random.uniform(k_span, (B, n_spans)) * valid_starts[:, None]
    ).astype(jnp.int32)
    t = jnp.arange(T)[None, None, :]
    span_hit = (t >= starts[..., None]) & (t < (starts + mask_consecutive)[..., None])
    time_mask = jnp.any(span_hit, axis=1)  # [B, T]
    time_mask = time_mask & length_valid(feat_lens, T)

    # -- 80/10/10 zero / random-replace / keep (per span) ----------------
    mode = jax.random.uniform(k_mode, (B, n_spans, 1))  # shared per span
    mode_t = jnp.where(span_hit, mode, 2.0).min(axis=1)  # [B, T] in {<=1, 2}
    rand_idx = (
        jax.random.uniform(k_rand, (B, T)) * jnp.maximum(feat_lens, 1)[:, None]
    ).astype(jnp.int32)
    rand_frames = jnp.take_along_axis(feats, rand_idx[..., None], axis=1)

    masked = feats
    masked = jnp.where((time_mask & (mode_t < 0.8))[..., None], 0.0, masked)
    masked = jnp.where(
        (time_mask & (mode_t >= 0.8) & (mode_t < 0.9))[..., None], rand_frames, masked
    )
    # mode in [0.9, 1): keep original values but still predict them

    # -- frequency band (TERA) ------------------------------------------
    if mask_frequency > 0:
        width = (jax.random.uniform(k_fwidth, (B, 1)) * mask_frequency * D).astype(jnp.int32)
        start = (jax.random.uniform(k_freq, (B, 1)) * jnp.maximum(D - width, 1)).astype(jnp.int32)
        d = jnp.arange(D)[None, :]
        freq_mask = (d >= start) & (d < start + width)  # [B, D]
        masked = jnp.where(freq_mask[:, None, :], 0.0, masked)

    return masked, time_mask


def length_valid(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    return jnp.arange(max_len)[None, :] < lengths[:, None]
