"""int8 W8A8 serving path: numeric sanity + param-tree compatibility.

The quantized path (ops/quant.py) must (a) approximate the float matmul
closely, (b) share the exact param tree with nn.Dense so converted
checkpoints load unchanged, and (c) keep trunk hidden states close to the
bf16 path (cosine similarity) — the quality bar for the extraction mode.
"""

import numpy as np

import jax
import jax.numpy as jnp

from s3prl_tpu.ops.quant import QuantDense, int8_matmul


def _cos(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_int8_matmul_close():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 96).astype(np.float32))
    w = jnp.asarray(rng.randn(96, 48).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(48).astype(np.float32) * 0.01)
    ref = x @ w + b
    q = int8_matmul(x, w, b)
    assert _cos(q, ref) > 0.9995
    # row/col scales track outliers: one huge row must not wreck the rest
    x2 = x.at[0].mul(100.0)
    q2 = int8_matmul(x2, w, b)
    ref2 = x2 @ w + b
    assert _cos(q2[1:], ref2[1:]) > 0.9995


def test_quant_dense_param_tree_matches_dense():
    import flax.linen as nn

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    dense = nn.Dense(16)
    params = dense.init(jax.random.key(0), x)["params"]
    qdense = QuantDense(16)
    # the float params load directly into the quantized module
    out_f = dense.apply({"params": params}, x)
    out_q = qdense.apply({"params": params}, x)
    assert set(params) == {"kernel", "bias"}
    assert _cos(out_q, out_f) > 0.999


def test_trunk_quantized_hidden_state_quality():
    from s3prl_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Trunk

    cfg = Wav2Vec2Config(
        conv_feature_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
        encoder_layers=3,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        conv_pos=16,
        conv_pos_groups=4,
        dropout=0.0,
        attention_dropout=0.0,
        dropout_input=0.0,
    )
    wavs = jnp.asarray(np.random.RandomState(2).randn(2, 8000).astype(np.float32))
    lens = jnp.asarray([8000, 6000])
    trunk = Wav2Vec2Trunk(cfg)
    params = jax.jit(
        lambda k: trunk.init(k, wavs, lens, deterministic=True)
    )(jax.random.key(0))["params"]
    hs_f, _ = trunk.apply({"params": params}, wavs, lens, deterministic=True)
    qtrunk = Wav2Vec2Trunk(cfg, quantize=True)
    hs_q, _ = qtrunk.apply({"params": params}, wavs, lens, deterministic=True)
    assert hs_q.shape == hs_f.shape
    for l in range(hs_f.shape[0]):
        assert _cos(hs_q[l], hs_f[l]) > 0.999, f"layer {l}"


def test_fused_int8_ffn_kernel_interpret():
    """kernels/ffn.py matches the float FFN closely (interpret mode)."""
    from s3prl_tpu.kernels.ffn import fused_int8_ffn

    rng = np.random.RandomState(3)
    B, T, C, F = 2, 7, 128, 256
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.randn(C, F).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(F).astype(np.float32) * 0.01)
    w2 = jnp.asarray(rng.randn(F, C).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.01)

    ref = jax.nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2
    out = fused_int8_ffn(x, w1, b1, w2, b2, interpret=True)
    assert _cos(out, ref) > 0.999
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.05 * float(jnp.abs(ref).max()))
