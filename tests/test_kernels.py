"""Pallas kernel tests (interpret mode on CPU): fused gated-bias attention
must match the plain-XLA reference path exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s3prl_tpu.kernels.flash_attention import gated_bias_attention
from s3prl_tpu.ops.attention import scaled_dot_attention
from s3prl_tpu.ops.masking import length_mask


def test_gated_bias_attention_matches_xla():
    rng = np.random.RandomState(0)
    B, H, T, Dh = 2, 4, 200, 32
    q = jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32)) * Dh ** -0.5
    k = jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32))
    pos_bias = jnp.asarray(rng.randn(H, T, T).astype(np.float32))
    gate = jnp.asarray(rng.rand(B, H, T).astype(np.float32)) * 2
    kv_lens = jnp.asarray([200, 130])

    got = gated_bias_attention(q, k, v, pos_bias, gate, kv_lens, interpret=True)
    bias = gate[..., None] * pos_bias[None]
    pad = ~length_mask(kv_lens, T)
    want = scaled_dot_attention(q, k, v, pad, bias)
    # only valid query rows matter (padded queries attend to garbage upstream)
    for b, n in enumerate([200, 130]):
        np.testing.assert_allclose(
            np.asarray(got)[b, :, :n], np.asarray(want)[b, :, :n], atol=2e-5
        )
