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


def test_flash_attention_nobias_matches_xla():
    from s3prl_tpu.kernels.flash_attention import flash_attention

    rng = np.random.RandomState(1)
    B, H, T, Dh = 2, 4, 150, 32
    q = jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32)) * Dh ** -0.5
    k = jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32))
    kv_lens = jnp.asarray([150, 90])
    got = flash_attention(q, k, v, kv_lens, interpret=True)
    want = scaled_dot_attention(q, k, v, ~length_mask(kv_lens, T))
    for b, n in enumerate([150, 90]):
        np.testing.assert_allclose(
            np.asarray(got)[b, :, :n], np.asarray(want)[b, :, :n], atol=2e-5
        )


def test_trunk_with_flash_matches_plain():
    """Wav2Vec2Trunk(use_flash=True) must agree with the XLA path (interpret
    mode can't be toggled through the module; on CPU the pallas kernel runs
    via the CPU lowering)."""
    from s3prl_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Trunk

    cfg = Wav2Vec2Config(
        conv_feature_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
        encoder_layers=2, encoder_embed_dim=64,
        encoder_ffn_embed_dim=128, encoder_attention_heads=4,
        dropout=0.0, attention_dropout=0.0, dropout_input=0.0,
    )
    rng = np.random.RandomState(0)
    wavs = jnp.asarray(rng.randn(2, 3200).astype(np.float32))
    lens = jnp.asarray([3200, 2400])
    plain = Wav2Vec2Trunk(cfg)
    v = plain.init(jax.random.key(0), wavs, lens, deterministic=True)
    hs_plain, _ = plain.apply(v, wavs, lens, deterministic=True)
    flashy = Wav2Vec2Trunk(cfg, use_flash=True)
    hs_flash, _ = flashy.apply(v, wavs, lens, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(hs_plain), np.asarray(hs_flash), atol=5e-5
    )


def test_fused_qkv_attention_matches_xla():
    """fused_qkv_attention (qkv buffer in, [B,T,C] out) vs the heads-last
    XLA path, with mixed lengths."""
    from s3prl_tpu.kernels.flash_attention import fused_qkv_attention
    from s3prl_tpu.ops.attention import attention_bthd
    from s3prl_tpu.ops.masking import length_mask

    B, T, H, Dh = 2, 50, 4, 16
    C = H * Dh
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, T, 3 * C).astype(np.float32))
    kv_lens = jnp.asarray([50, 33], jnp.int32)

    out = fused_qkv_attention(qkv, kv_lens, H, interpret=True)

    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, H, Dh) * (Dh ** -0.5)
    ref = attention_bthd(
        q, k.reshape(B, T, H, Dh), v.reshape(B, T, H, Dh),
        ~length_mask(kv_lens, T),
    ).reshape(B, T, C)
    valid = np.asarray(length_mask(kv_lens, T))[..., None]
    np.testing.assert_allclose(
        np.asarray(out) * valid, np.asarray(ref) * valid, atol=2e-5
    )


def test_fused_attention_block_matches_split_path():
    """fused_attention_block (LN+int8 QKV+MHA+int8 out-proj+residual in one
    kernel) vs the split serving path (XLA LN -> int8_matmul ->
    fused_qkv_attention_outproj), mixed lengths."""
    import flax.linen as fnn

    from s3prl_tpu.kernels.flash_attention import (
        fused_attention_block, fused_qkv_attention_outproj)
    from s3prl_tpu.ops.quant import int8_matmul

    B, T, C, H = 2, 77, 128, 4
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.5, jnp.bfloat16)
    wq = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.05)
    bq = jnp.asarray(rng.randn(3 * C).astype(np.float32) * 0.02)
    wo = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.05)
    bo = jnp.asarray(rng.randn(C).astype(np.float32) * 0.02)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    be = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    kv_lens = jnp.asarray([77, 41], jnp.int32)

    h = fnn.LayerNorm(epsilon=1e-5, dtype=jnp.float32).apply(
        {"params": {"scale": g, "bias": be}}, x).astype(jnp.bfloat16)
    qkv = int8_matmul(h, wq, bq, out_dtype=jnp.bfloat16)
    ref = fused_qkv_attention_outproj(qkv, x, wo, bo, kv_lens, H, interpret=True)

    out = fused_attention_block(x, wq, bq, (g, be), wo, bo, kv_lens, H,
                                interpret=True)
    a = np.asarray(ref, np.float32)
    b = np.asarray(out, np.float32)
    for i, L in enumerate([77, 41]):
        av, bv = a[i, :L].ravel(), b[i, :L].ravel()
        cos = (av * bv).sum() / (np.linalg.norm(av) * np.linalg.norm(bv))
        # both paths quantize (different rounding points); agreement is
        # near-exact up to the int8 step
        assert cos > 0.999, (i, cos)


def test_fused_attention_block_bf16_matches_xla():
    """fused_attention_block_bf16 (LN + bf16 QKV + MHA + bf16 out-proj +
    residual in one kernel — the reference-precision serving twin of the
    int8 whole-block kernel) vs plain-XLA f32 reference math, mixed
    lengths. Tolerance is bf16 GEMM rounding."""
    from s3prl_tpu.kernels.flash_attention import fused_attention_block_bf16
    from s3prl_tpu.ops.masking import length_mask

    B, T, C, H = 2, 77, 128, 4
    Dh = C // H
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.5, jnp.bfloat16)
    wq = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.05)
    bq = jnp.asarray(rng.randn(3 * C).astype(np.float32) * 0.02)
    wo = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.05)
    bo = jnp.asarray(rng.randn(C).astype(np.float32) * 0.02)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    be = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    kv_lens = jnp.asarray([77, 41], jnp.int32)

    out = fused_attention_block_bf16(x, wq, bq, (g, be), wo, bo, kv_lens, H,
                                     interpret=True)

    # f32 reference: LN -> QKV -> per-head softmax(QK^T/sqrt(Dh))V -> out
    xf = np.asarray(x, np.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    xn = (xf - mean) / np.sqrt(var + 1e-5) * np.asarray(g) + np.asarray(be)
    qkv = xn @ np.asarray(wq) + np.asarray(bq)
    q, k, v = np.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
    scores = q @ k.transpose(0, 1, 3, 2) * Dh ** -0.5
    pad = ~np.asarray(length_mask(kv_lens, T))
    scores = np.where(pad[:, None, None, :], -1e9, scores)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ctx = (p @ v).transpose(0, 2, 1, 3).reshape(B, T, C)
    want = ctx @ np.asarray(wo) + np.asarray(bo) + xf

    got = np.asarray(out, np.float32)
    for i, L in enumerate([77, 41]):
        av, bv = want[i, :L].ravel(), got[i, :L].ravel()
        cos = (av * bv).sum() / (np.linalg.norm(av) * np.linalg.norm(bv))
        assert cos > 0.9995, (i, cos)


def test_fused_bf16_ffn_matches_xla():
    """fused_bf16_ffn (LN + fc1 + erf GELU + fc2 + residual, weights
    streamed in grid-mapped panels, f32 scratch accumulator) vs plain-XLA
    f32 reference math. Multi-chunk FFN dim so the accumulator path is
    exercised."""
    import jax.nn

    from s3prl_tpu.kernels.ffn import fused_bf16_ffn

    B, T, C, F = 2, 50, 128, 512
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(C, F).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(F).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.randn(F, C).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.02)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    be = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))

    import s3prl_tpu.kernels.ffn as ffn_mod
    orig = ffn_mod.BF16_CHUNK
    ffn_mod.BF16_CHUNK = 128  # force a real multi-chunk accumulation (4)
    try:
        out = fused_bf16_ffn(x, w1, b1, w2, b2, ln=(g, be), residual=True,
                             interpret=True)
    finally:
        ffn_mod.BF16_CHUNK = orig

    xf = np.asarray(x, np.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    xn = (xf - mean) / np.sqrt(var + 1e-5) * np.asarray(g) + np.asarray(be)
    h = np.asarray(jax.nn.gelu(xn @ np.asarray(w1) + np.asarray(b1),
                               approximate=False))
    want = h @ np.asarray(w2) + np.asarray(b2) + xf

    got = np.asarray(out, np.float32)
    av, bv = want.ravel(), got.ravel()
    cos = (av * bv).sum() / (np.linalg.norm(av) * np.linalg.norm(bv))
    assert cos > 0.9995, cos


def test_bf16_block_routing_matches_split_path(monkeypatch):
    """Model-level: the bf16 whole-block branch (S3PRL_BF16_BLOCK, the
    quantize=False serving default on TPU) must match the split XLA path
    through a real pre-LN trunk forward."""
    import s3prl_tpu.models.transformer as tr
    from s3prl_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Trunk

    monkeypatch.setattr(tr, "_fused_block_available", lambda: True)
    cfg = Wav2Vec2Config(
        conv_feature_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
        encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
        encoder_attention_heads=4, conv_pos=16, conv_pos_groups=4,
        layer_norm_first=True, dropout=0.0, attention_dropout=0.0,
        dropout_input=0.0,
    )
    wavs = jnp.asarray(np.random.RandomState(5).randn(2, 6000).astype(np.float32))
    lens = jnp.asarray([6000, 4000])
    trunk = Wav2Vec2Trunk(cfg, quantize=False, use_flash=True,
                          dtype=jnp.bfloat16)
    params = jax.jit(
        lambda key: trunk.init(key, wavs, lens, deterministic=True)
    )(jax.random.key(0))["params"]

    monkeypatch.setenv("S3PRL_BF16_BLOCK", "1")
    hs_block, _ = trunk.apply({"params": params}, wavs, lens,
                              deterministic=True)
    monkeypatch.setenv("S3PRL_BF16_BLOCK", "0")
    hs_split, _ = trunk.apply({"params": params}, wavs, lens,
                              deterministic=True)
    a = np.asarray(hs_block[-1], np.float32).ravel()
    b = np.asarray(hs_split[-1], np.float32).ravel()
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.999, cos


def test_bf16_fused_conv_chain_matches_unfused(monkeypatch):
    """S3PRL_FUSED_CONV=1 routes layer_norm-mode extraction through the
    pair-interleaved fused conv+LN+GELU kernels; output matches the XLA
    path (train=True keeps the differentiable unfused path)."""
    monkeypatch.setenv("S3PRL_FUSED_CONV", "1")
    from s3prl_tpu.models.convfe import ConvFeatureExtractor

    layers = ((64, 10, 5), (64, 3, 2), (96, 3, 2), (64, 2, 2))
    rng = np.random.RandomState(8)
    wavs = jnp.asarray(rng.randn(2, 3200).astype(np.float32))
    mod = ConvFeatureExtractor(layers, "layer_norm", False, jnp.float32)
    params = jax.jit(mod.init)(jax.random.key(0), wavs)
    unfused = mod.apply(params, wavs, train=True,
                        rngs={"dropout": jax.random.key(1)})
    fused = mod.apply(params, wavs)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(unfused), atol=1e-4
    )


def test_online_flash_attention_matches_xla():
    """K-blocked online-softmax kernel (long-audio path, T > whole-T VMEM
    budget) vs the XLA reference, mixed lengths."""
    from s3prl_tpu.kernels.flash_attention import online_flash_attention
    from s3prl_tpu.ops.attention import scaled_dot_attention
    from s3prl_tpu.ops.masking import length_mask

    B, H, T, Dh = 2, 2, 2304, 16  # T spans multiple 1024-key blocks
    rng = np.random.RandomState(11)
    q = jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32) * 0.3)
    kv_lens = jnp.asarray([2304, 1500], jnp.int32)

    out = online_flash_attention(q, k, v, kv_lens, interpret=True)
    ref = scaled_dot_attention(q, k, v, ~length_mask(kv_lens, T))
    valid = np.asarray(length_mask(kv_lens, T))[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(out) * valid, np.asarray(ref) * valid, atol=2e-5
    )


def test_pallas_posconv_matches_xla(monkeypatch):
    """S3PRL_POSCONV=pallas routes the grouped conv positional embedding
    through the long-K-GEMM kernel (kernels/posconv.py); numerics match the
    XLA feature_group_count lowering on identical params."""
    from s3prl_tpu.models.transformer import ConvPositionalEmbedding

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 53, 128).astype(np.float32))
    mod = ConvPositionalEmbedding(features=128, kernel_size=32, groups=4)
    params = mod.init(jax.random.key(0), x)
    ref = mod.apply(params, x)
    monkeypatch.setenv("S3PRL_POSCONV", "pallas")
    out = mod.apply(params, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_posconv_int8_quality():
    """pos_conv_gelu_q8 (per-window activation scale, int8 MXU GEMMs) stays
    cosine >0.999 vs the f32 XLA grouped conv — the serving-precision gate
    for the quantized positional embedding."""
    import flax.linen as nn

    from s3prl_tpu.kernels.posconv import pos_conv_gelu_q8

    rng = np.random.RandomState(7)
    B, T, C, G, K = 2, 64, 128, 2, 32
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    kern = jnp.asarray(rng.randn(K, C // G, C).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(C).astype(np.float32) * 0.01)

    pad = K // 2
    ref = jax.lax.conv_general_dilated(
        x, kern, (1,), ((pad, pad),), feature_group_count=G,
        dimension_numbers=("NWC", "WIO", "NWC"))[:, :-1] + bias
    ref = nn.gelu(ref, approximate=False)

    out = pos_conv_gelu_q8(x, kern, bias, groups=G, interpret=True)
    r, o = np.asarray(ref, np.float64), np.asarray(out, np.float64)
    cos = (r * o).sum() / np.sqrt((r**2).sum() * (o**2).sum())
    assert cos > 0.999, cos


def test_bq_env_override_matches_default(monkeypatch):
    """S3PRL_BQ retiles the serving attention kernels without changing
    numerics (T=200 splits into two 128-row blocks instead of one 512)."""
    from s3prl_tpu.ops.attention import attention_bthd

    B, T, H, Dh = 2, 200, 4, 16
    C = H * Dh
    rng = np.random.RandomState(2)
    qkv = jnp.asarray(rng.randn(B, T, 3 * C).astype(np.float32))
    kv_lens = jnp.asarray([200, 130], jnp.int32)

    monkeypatch.setenv("S3PRL_BQ", "128")
    from s3prl_tpu.kernels.flash_attention import fused_qkv_attention

    out = fused_qkv_attention(qkv, kv_lens, H, interpret=True)

    q, k, v = jnp.split(qkv, 3, axis=-1)
    ref = attention_bthd(
        q.reshape(B, T, H, Dh) * (Dh ** -0.5),
        k.reshape(B, T, H, Dh), v.reshape(B, T, H, Dh),
        ~length_mask(kv_lens, T),
    ).reshape(B, T, C)
    valid = np.asarray(length_mask(kv_lens, T))[..., None]
    np.testing.assert_allclose(
        np.asarray(out) * valid, np.asarray(ref) * valid, atol=2e-5
    )


def test_pallas_ln_gelu_matches_xla():
    """kernels/ln_gelu.py (the fused mid-conv LN+GELU epilogue, S3PRL_MIDLN)
    matches nn.LayerNorm(fp32) + exact GELU; also checks the padded-rows
    path (rows not a multiple of the kernel's row block)."""
    import flax.linen as nn

    from s3prl_tpu.kernels.ln_gelu import ln_gelu

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(3, 37, 128).astype(np.float32), jnp.bfloat16)
    scale = jnp.asarray(rng.randn(128).astype(np.float32) * 0.3 + 1.0)
    bias = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)

    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
    ref = nn.gelu(
        ln.apply({"params": {"scale": scale, "bias": bias}}, x), approximate=False
    ).astype(jnp.bfloat16)
    out = ln_gelu(x, scale, bias, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_convfe_midln_pallas_matches_xla(monkeypatch):
    """S3PRL_MIDLN=pallas (opt-in A/B knob; default stays on XLA, which wins
    end-to-end) keeps the layer_norm-mode conv extractor's output equal to
    the pure-XLA lowering on identical params."""
    from s3prl_tpu.models.convfe import ConvFeatureExtractor

    layers = ((64, 10, 5), (64, 3, 2), (64, 2, 2))
    rng = np.random.RandomState(3)
    wavs = jnp.asarray(rng.randn(2, 1600).astype(np.float32))
    mod = ConvFeatureExtractor(conv_layers=layers, mode="layer_norm")
    params = mod.init(jax.random.key(0), wavs)
    monkeypatch.setenv("S3PRL_MIDLN", "xla")
    ref = mod.apply(params, wavs)
    monkeypatch.setenv("S3PRL_MIDLN", "pallas")
    out = mod.apply(params, wavs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_gated_online_flash_attention_matches_xla():
    """Long-audio WavLM path (VERDICT r4 #7): the K-blocked gated-bias
    online kernel (pos_bias streamed from HBM in blocks; the [B,H,T,T]
    gated product never materializes) vs the XLA reference at a T spanning
    multiple key blocks, mixed lengths."""
    from s3prl_tpu.kernels.flash_attention import (
        MAX_KERNEL_T, gated_bias_attention)

    B, H, T, Dh = 2, 2, MAX_KERNEL_T + 256, 16
    rng = np.random.RandomState(12)
    q = jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32) * 0.3)
    pos_bias = jnp.asarray(rng.randn(H, T, T).astype(np.float32) * 0.5)
    gate = jnp.asarray(rng.rand(B, H, T).astype(np.float32)) * 2
    kv_lens = jnp.asarray([T, 1500], jnp.int32)

    got = gated_bias_attention(q, k, v, pos_bias, gate, kv_lens,
                               interpret=True)
    bias = gate[..., None] * pos_bias[None]
    pad = ~length_mask(kv_lens, T)
    want = scaled_dot_attention(q, k, v, pad, bias)
    valid = np.asarray(length_mask(kv_lens, T))[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * valid, np.asarray(want) * valid, atol=2e-5
    )


@pytest.mark.parametrize("impl", ["int8", "bf16"])
def test_postnorm_attention_block_matches_xla(impl):
    """postnorm=True whole-block attention kernels compute the post-LN
    block order LN(x + out_proj(MHA(qkv_proj(x)))) (HuBERT-Base family,
    reference fairseq layer_norm_first=False:
    wav2vec2 TransformerSentenceEncoderLayer) — vs f32 XLA reference math,
    mixed lengths."""
    from s3prl_tpu.kernels.flash_attention import (
        fused_attention_block, fused_attention_block_bf16)
    from s3prl_tpu.ops.masking import length_mask

    B, T, C, H = 2, 77, 128, 4
    Dh = C // H
    rng = np.random.RandomState(7)
    xf = rng.randn(B, T, C).astype(np.float32) * 0.5
    wq = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.05)
    bq = jnp.asarray(rng.randn(3 * C).astype(np.float32) * 0.02)
    wo = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.05)
    bo = jnp.asarray(rng.randn(C).astype(np.float32) * 0.02)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    be = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    kv_lens = jnp.asarray([77, 41], jnp.int32)

    if impl == "int8":
        x = jnp.asarray(xf)
        out = fused_attention_block(x, wq, bq, (g, be), wo, bo, kv_lens, H,
                                    postnorm=True, interpret=True)
    else:
        x = jnp.asarray(xf, jnp.bfloat16)
        out = fused_attention_block_bf16(x, wq, bq, (g, be), wo, bo,
                                         kv_lens, H, postnorm=True,
                                         interpret=True)

    # f32 reference: QKV on RAW x -> MHA -> out-proj -> +x -> LN
    qkv = xf @ np.asarray(wq) + np.asarray(bq)
    q, k, v = np.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
    scores = q @ k.transpose(0, 1, 3, 2) * Dh ** -0.5
    pad = ~np.asarray(length_mask(kv_lens, T))
    scores = np.where(pad[:, None, None, :], -1e9, scores)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ctx = (p @ v).transpose(0, 2, 1, 3).reshape(B, T, C)
    y = ctx @ np.asarray(wo) + np.asarray(bo) + xf
    mean = y.mean(-1, keepdims=True)
    var = ((y - mean) ** 2).mean(-1, keepdims=True)
    want = (y - mean) / np.sqrt(var + 1e-5) * np.asarray(g) + np.asarray(be)

    got = np.asarray(out, np.float32)
    floor = 0.999 if impl == "int8" else 0.9995
    for i, L in enumerate([77, 41]):
        av, bv = want[i, :L].ravel(), got[i, :L].ravel()
        cos = (av * bv).sum() / (np.linalg.norm(av) * np.linalg.norm(bv))
        assert cos > floor, (impl, i, cos)


@pytest.mark.parametrize("impl", ["int8", "bf16"])
def test_postnorm_ffn_kernel_matches_xla(impl):
    """postnorm=True fused FFN kernels compute LN(x + fc2(gelu(fc1(x))))
    — the post-LN FFN half — vs f32 XLA reference math."""
    import jax.nn

    from s3prl_tpu.kernels.ffn import fused_bf16_ffn, fused_int8_ffn

    B, T, C, F = 2, 50, 128, 512
    rng = np.random.RandomState(8)
    xf = rng.randn(B, T, C).astype(np.float32) * 0.5
    w1 = jnp.asarray(rng.randn(C, F).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(F).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.randn(F, C).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.02)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    be = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))

    if impl == "int8":
        out = fused_int8_ffn(jnp.asarray(xf), w1, b1, w2, b2, ln=(g, be),
                             residual=True, postnorm=True, interpret=True)
        h = np.asarray(jax.nn.gelu(xf @ np.asarray(w1) + np.asarray(b1),
                                   approximate=True))
    else:
        out = fused_bf16_ffn(jnp.asarray(xf, jnp.bfloat16), w1, b1, w2, b2,
                             ln=(g, be), residual=True, postnorm=True,
                             interpret=True)
        h = np.asarray(jax.nn.gelu(xf @ np.asarray(w1) + np.asarray(b1),
                                   approximate=False))
    y = h @ np.asarray(w2) + np.asarray(b2) + xf
    mean = y.mean(-1, keepdims=True)
    var = ((y - mean) ** 2).mean(-1, keepdims=True)
    want = (y - mean) / np.sqrt(var + 1e-5) * np.asarray(g) + np.asarray(be)

    got = np.asarray(out, np.float32)
    av, bv = want.ravel(), got.ravel()
    cos = (av * bv).sum() / (np.linalg.norm(av) * np.linalg.norm(bv))
    assert cos > (0.999 if impl == "int8" else 0.9995), (impl, cos)


@pytest.mark.parametrize("impl", ["int8", "bf16"])
def test_postln_serving_block_routing_matches_float(impl, monkeypatch):
    """Model-level: the post-LN (layer_norm_first=False, HuBERT-Base
    family) serving branch routes through the postnorm whole-block kernels
    and must match the float module path through a real trunk forward
    (reference block order: fairseq layer_norm_first=False in
    wav2vec2/transformer_sentence_encoder_layer)."""
    import s3prl_tpu.models.transformer as tr
    from s3prl_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Trunk

    monkeypatch.setattr(tr, "_fused_block_available", lambda: True)
    cfg = Wav2Vec2Config(
        conv_feature_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
        encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
        encoder_attention_heads=4, conv_pos=16, conv_pos_groups=4,
        layer_norm_first=False, dropout=0.0, attention_dropout=0.0,
        dropout_input=0.0,
    )
    wavs = jnp.asarray(np.random.RandomState(9).randn(2, 6000).astype(np.float32))
    lens = jnp.asarray([6000, 4000])
    float_trunk = Wav2Vec2Trunk(cfg, quantize=False, use_flash=False)
    params = jax.jit(
        lambda key: float_trunk.init(key, wavs, lens, deterministic=True)
    )(jax.random.key(0))["params"]
    hs_ref, _ = float_trunk.apply({"params": params}, wavs, lens,
                                  deterministic=True)

    if impl == "int8":
        trunk = Wav2Vec2Trunk(cfg, quantize=True, use_flash=True)
    else:
        trunk = Wav2Vec2Trunk(cfg, quantize=False, use_flash=True,
                              dtype=jnp.bfloat16)
    hs, _ = trunk.apply({"params": params}, wavs, lens, deterministic=True)

    a = np.asarray(hs_ref[-1], np.float32).ravel()
    b = np.asarray(hs[-1], np.float32).ravel()
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > (0.99 if impl == "int8" else 0.995), (impl, cos)


def test_int8_av_optin_matches_default(monkeypatch):
    """S3PRL_INT8_AV=1 (int8 PV matmul; measured −1.1–1.4% on-chip, kept
    opt-in) must stay numerically pinned to the default int8 block path —
    p quantizes losslessly up to 1/127 (softmax row max is exactly 1) and
    V per-column: worst cosine 0.99999+ at these shapes."""
    from s3prl_tpu.kernels.flash_attention import fused_attention_block

    B, T, C, H = 2, 200, 256, 4
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.5, jnp.bfloat16)
    wq = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.05)
    bq = jnp.asarray(rng.randn(3 * C).astype(np.float32) * 0.02)
    ln = (jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32))
    wo = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.05)
    bo = jnp.asarray(rng.randn(C).astype(np.float32) * 0.02)
    kv = jnp.asarray([200, 130], jnp.int32)

    for postnorm in (False, True):
        monkeypatch.setenv("S3PRL_INT8_AV", "0")
        ref = np.asarray(
            fused_attention_block(x, wq, bq, ln, wo, bo, kv, H,
                                  postnorm=postnorm, interpret=True),
            np.float64)
        monkeypatch.setenv("S3PRL_INT8_AV", "1")
        out = np.asarray(
            fused_attention_block(x, wq, bq, ln, wo, bo, kv, H,
                                  postnorm=postnorm, interpret=True),
            np.float64)
        cos = (ref * out).sum() / np.sqrt((ref**2).sum() * (out**2).sum())
        assert cos > 0.9999, (postnorm, cos)
