"""Length masks and static-shape mask sampling for SSL training.

Variable-length audio under XLA means everything is padded to static shapes
and masked; these helpers centralize the length arithmetic so the reference's
length rules are reproduced exactly (reference: s3prl/nn/upstream.py:166-231,
wav2vec2_model.py:1933-2067 `compute_mask_indices`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def length_mask(lengths: jnp.ndarray, max_len: int, dtype=jnp.bool_) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] mask, True on valid positions."""
    return (jnp.arange(max_len)[None, :] < lengths[:, None]).astype(dtype)


def lengths_after_conv1d(lengths: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """Valid-length arithmetic for an unpadded strided conv."""
    return jnp.maximum((lengths - kernel) // stride + 1, 0)


def upstream_feat_lengths(wav_lens: jnp.ndarray, stride: int) -> jnp.ndarray:
    """The reference's h_len rule: floor((wav_len - 1) / stride) + 1
    (reference: s3prl/nn/upstream.py:223)."""
    return (wav_lens - 1) // stride + 1


def expected_max_feat_len(max_wav_len: int, stride: int) -> int:
    """len(range(0, max_wav_len, stride)) (reference: s3prl/nn/upstream.py:220)."""
    return -(-max_wav_len // stride)


def match_length(hs: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Trim or repeat-last-frame hs[B, T, H] to exactly target_len frames
    (reference: s3prl/nn/upstream.py:166-179 `_match_length`)."""
    cur = hs.shape[1]
    if cur == target_len:
        return hs
    if cur > target_len:
        assert cur // target_len == 1, f"{cur} vs {target_len}"
        return hs[:, :target_len, :]
    assert target_len // cur == 1, f"{target_len} vs {cur}"
    pad = jnp.repeat(hs[:, -1:, :], target_len - cur, axis=1)
    return jnp.concatenate([hs, pad], axis=1)


def compute_mask_indices(
    key: jax.Array,
    shape: Tuple[int, int],
    padding_mask: Optional[jnp.ndarray],
    mask_prob: float,
    mask_length: int,
    min_masks: int = 2,
) -> jnp.ndarray:
    """Static-shape span mask sampling (wav2vec2/HuBERT style).

    The reference's `compute_mask_indices` (wav2vec2_model.py:1933) samples a
    data-dependent *count* of spans in numpy. For XLA we re-express it with a
    static upper bound: sample `max_spans` candidate span starts uniformly and
    keep the first `num_spans(b)` of them, where
    num_spans(b) = mask_prob * valid_len(b) / mask_length + rand  (same mean
    as the reference's "all_num_mask" formula). Returns bool [B, T], True on
    masked positions; padded positions are never masked.
    """
    B, T = shape
    valid = (
        jnp.full((B,), T, jnp.int32)
        if padding_mask is None
        else jnp.sum(~padding_mask, axis=-1).astype(jnp.int32)
    )
    k1, k2, k3 = jax.random.split(key, 3)
    rand_round = jax.random.uniform(k1, (B,))
    num_spans = (mask_prob * valid.astype(jnp.float32) / float(mask_length) + rand_round).astype(jnp.int32)
    num_spans = jnp.maximum(num_spans, min_masks)
    max_spans = max(min_masks, int(mask_prob * T / mask_length) + 2)
    num_spans = jnp.minimum(num_spans, max_spans)

    # sample span starts in [0, valid - mask_length]
    span_room = jnp.maximum(valid - mask_length, 1)
    starts = (jax.random.uniform(k2, (B, max_spans)) * span_room[:, None]).astype(jnp.int32)
    keep = jnp.arange(max_spans)[None, :] < num_spans[:, None]  # [B, S]

    t = jnp.arange(T)[None, None, :]  # [1, 1, T]
    s = starts[:, :, None]  # [B, S, 1]
    span_hit = (t >= s) & (t < s + mask_length) & keep[:, :, None]
    mask = jnp.any(span_hit, axis=1)  # [B, T]
    mask = mask & (jnp.arange(T)[None, :] < valid[:, None])
    return mask
