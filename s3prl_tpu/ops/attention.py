"""Multi-head attention ops for the SSL encoder stack.

Plain-XLA implementation tuned for TPU: one fused QKV projection (single big
matmul for the MXU), fp32 softmax for numerical stability under bf16 compute,
and an optional additive attention bias hook used by WavLM's gated
relative-position bias (reference behavior: s3prl/upstream/wavlm/modules.py:389-470).

A Pallas flash-attention kernel can be swapped in behind the same signature
(see s3prl_tpu/kernels/) once sequence lengths make it profitable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-but-finite: avoids NaNs from all-masked rows


def scaled_dot_attention(
    q: jnp.ndarray,  # [B, H, T, Dh]
    k: jnp.ndarray,  # [B, H, S, Dh]
    v: jnp.ndarray,  # [B, H, S, Dh]
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] True = PAD
    attn_bias: Optional[jnp.ndarray] = None,  # broadcastable to [B, H, T, S]
    softmax_dtype=jnp.float32,
) -> jnp.ndarray:
    """Returns [B, H, T, Dh]. q is expected pre-scaled by Dh**-0.5."""
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=softmax_dtype)
    if attn_bias is not None:
        scores = scores + attn_bias.astype(softmax_dtype)
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, scores)
    probs = jax.nn.softmax(scores.astype(softmax_dtype), axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", probs.astype(v.dtype), v)


def attention_bthd(
    q: jnp.ndarray,  # [B, T, H, Dh] — heads-last, no transposed copies
    k: jnp.ndarray,  # [B, S, H, Dh]
    v: jnp.ndarray,  # [B, S, H, Dh]
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] True = PAD
    attn_bias: Optional[jnp.ndarray] = None,  # broadcastable to [B, H, T, S]
    softmax_dtype=jnp.float32,
) -> jnp.ndarray:
    """Attention that keeps tensors in [B, T, H, Dh] layout.

    The q/k/v views are cheap reshapes of the fused qkv matmul output; the
    head axis is carried as an einsum batch dim so XLA folds the layout into
    the matmuls instead of materializing four [B, H, T, Dh] transposed copies
    per layer (a ~50 GB/forward HBM tax on HuBERT-Large at B=128).
    Returns [B, T, H, Dh].
    """
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=softmax_dtype)
    if attn_bias is not None:
        scores = scores + attn_bias.astype(softmax_dtype)
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, scores)
    probs = jax.nn.softmax(scores.astype(softmax_dtype), axis=-1)
    return jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v)
