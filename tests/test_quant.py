"""int8 W8A8 serving path: numeric sanity + param-tree compatibility.

The quantized path (ops/quant.py) must (a) approximate the float matmul
closely, (b) share the exact param tree with nn.Dense so converted
checkpoints load unchanged, and (c) keep trunk hidden states close to the
bf16 path (cosine similarity) — the quality bar for the extraction mode.
"""

import pytest
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


def test_hubert_large_quantized_hidden_state_quality(monkeypatch):
    """int8 quality AT SERVING SCALE (VERDICT r2 weak #3): per-layer cosine
    on the real HuBERT-Large config (24L, d=1024) — quantization error must
    not compound through the full depth. Random-init trunk, CPU; the
    serving bench's quality claim (bench.py) cites this test.

    Two int8 variants are gated: the inline unfused path (QuantDense,
    dynamic per-row scales) and the REAL serving path (fused whole-block
    kernels + qcache: cached int8 weights + calibrated static activation
    scales, interpret-mode on CPU) — the latter is exactly what bench.py
    times on TPU."""
    import s3prl_tpu.models.transformer as tr
    from s3prl_tpu import hub

    up_f = hub.load("hubert_large_ll60k")
    up_q = hub.load("hubert_large_ll60k", quantize=True)

    rng = np.random.RandomState(11)
    wavs = rng.randn(2, 8000).astype(np.float32)
    lens = np.asarray([8000, 6400], np.int32)

    hs_f, _ = jax.jit(up_f.apply_standardized)(up_f.params, wavs, lens)
    hs_q, _ = jax.jit(up_q.apply_standardized)(up_f.params, wavs, lens)
    assert hs_f.shape[0] == 25 and hs_f.shape[-1] == 1024
    worst = 1.0
    for l in range(hs_f.shape[0]):
        c = _cos(hs_q[l], hs_f[l])
        worst = min(worst, c)
        assert c > 0.999, f"layer {l}: cos={c:.5f}"
    print(f"hubert-large 24L int8 vs float: worst layer cos={worst:.5f}")

    # the serving path: fused kernels + qcache (static activation scales)
    monkeypatch.setattr(tr, "_fused_block_available", lambda: True)
    up_s = hub.load("hubert_large_ll60k", quantize=True)
    assert "qcache" in up_s.params
    hs_s, _ = jax.jit(up_s.apply_standardized)(up_s.params, wavs, lens)
    worst_s = 1.0
    for l in range(hs_f.shape[0]):
        c = _cos(hs_s[l], hs_f[l])
        worst_s = min(worst_s, c)
        assert c > 0.999, f"serving path layer {l}: cos={c:.5f}"
    print(f"hubert-large 24L serving (fused+static) vs float: "
          f"worst layer cos={worst_s:.5f}")


def test_int8_features_downstream_neutral():
    """Downstream neutrality (the north star's 'within 0.1' includes the
    serving config): a linear probe trained on FLOAT features must score the
    same when evaluated on INT8-path features. Separable synthetic classes;
    probe = mean-pool + logistic regression (the SUPERB frozen-probe shape)."""
    import optax

    from s3prl_tpu import hub

    up_f = hub.load("hubert")  # Base trunk keeps the default suite fast
    up_q = hub.load("hubert", quantize=True)

    rng = np.random.RandomState(12)
    n, classes, T = 32, 4, 8000
    t = np.arange(T) / 16000.0
    labels = np.arange(n) % classes
    wavs = np.stack([
        (np.sin(2 * np.pi * (300 + 400 * y) * t) + 0.3 * rng.randn(T)).astype(np.float32)
        for y in labels
    ])
    lens = np.full((n,), T, np.int32)

    def pooled(up, params):
        feats = []
        fwd = jax.jit(up.apply_standardized)
        for i in range(0, n, 8):
            hs, h_lens = fwd(params, wavs[i : i + 8], lens[i : i + 8])
            feats.append(np.asarray(hs[-1].mean(axis=1)))  # [B, H] mean-pool
        return np.concatenate(feats)

    x_f = pooled(up_f, up_f.params)
    x_q = pooled(up_q, up_f.params)

    w = jnp.zeros((x_f.shape[1], classes))
    b = jnp.zeros((classes,))
    opt = optax.adam(1e-2)
    state = opt.init((w, b))
    y = jnp.asarray(labels)
    xf = jnp.asarray(x_f)

    @jax.jit
    def step(wb, state):
        def loss_fn(wb):
            logits = xf @ wb[0] + wb[1]
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        g = jax.grad(loss_fn)(wb)
        updates, state = opt.update(g, state)
        return optax.apply_updates(wb, updates), state

    wb = (w, b)
    for _ in range(200):
        wb, state = step(wb, state)

    def acc(x):
        pred = np.argmax(np.asarray(x) @ np.asarray(wb[0]) + np.asarray(wb[1]), -1)
        return float((pred == labels).mean())

    acc_float, acc_int8 = acc(x_f), acc(x_q)
    assert acc_float >= 0.9, f"probe failed to train: {acc_float}"
    assert abs(acc_float - acc_int8) < 0.1, (acc_float, acc_int8)


def test_int8_conv1d_valid_close():
    """int8 conv matches the XLA conv at both mid-layer kernel sizes."""
    from s3prl_tpu.ops.quant import int8_conv1d_valid

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 41, 24).astype(np.float32))
    for k in (2, 3):
        w = jnp.asarray(rng.randn(k, 24, 16).astype(np.float32) * 0.2)
        ref = jax.lax.conv_general_dilated(
            x.transpose(0, 2, 1), w.transpose(2, 1, 0), (2,), "VALID"
        ).transpose(0, 2, 1)
        out = int8_conv1d_valid(x, w, 2)
        assert out.shape == ref.shape
        assert _cos(out, ref) > 0.999, k


def test_fused_int8_ffn_kernel_interpret():
    """kernels/ffn.py matches the float FFN closely (interpret mode),
    with and without the folded LayerNorm/residual."""
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

    # folded LN + residual (the pre-LN block's second half)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    be = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    xn = (x - mu) / jnp.sqrt(var + 1e-5) * g + be
    ref2 = x + (jax.nn.gelu(xn @ w1 + b1, approximate=False) @ w2 + b2)
    out2 = fused_int8_ffn(x, w1, b1, w2, b2, ln=(g, be), residual=True,
                          interpret=True)
    assert _cos(out2, ref2) > 0.999


def test_fused_int8_ffn_nondivisible_chunks():
    """FFN dims not divisible by the in-kernel CHUNK must still cover every
    column (regression: the last partial chunk used to be dropped)."""
    from s3prl_tpu.kernels.ffn import CHUNK, fused_int8_ffn

    rng = np.random.RandomState(9)
    B, T, C = 1, 5, 128
    # > 3072 so the adaptive single-chunk fast path does not apply and the
    # kernel really iterates: one full chunk + a partial one
    F = max(CHUNK, 3072) + 128
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.randn(C, F).astype(np.float32) * 0.05)
    b1 = jnp.zeros((F,))
    w2 = jnp.asarray(rng.randn(F, C).astype(np.float32) * 0.05)
    b2 = jnp.zeros((C,))
    # dropping the 128-column tail would cap the cosine near
    # sqrt(1024/1152) ~ 0.94; quantization alone stays >0.999
    ref = jax.nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2
    out = fused_int8_ffn(x, w1, b1, w2, b2, interpret=True)
    assert _cos(out, ref) > 0.999


def test_fused_int8_linear_kernel_interpret():
    """fused_int8_linear matches LN -> matmul -> bias -> +residual."""
    from s3prl_tpu.kernels.ffn import fused_int8_linear

    rng = np.random.RandomState(4)
    B, T, C, N = 2, 9, 128, 128
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.randn(C, N).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(N).astype(np.float32) * 0.01)
    res = jnp.asarray(rng.randn(B, T, N).astype(np.float32) * 0.5)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    be = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))

    out = fused_int8_linear(x, w, b, interpret=True)
    assert _cos(out, x @ w + b) > 0.999

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    xn = (x - mu) / jnp.sqrt(var + 1e-5) * g + be
    out2 = fused_int8_linear(x, w, b, ln=(g, be), residual=res, interpret=True)
    assert _cos(out2, xn @ w + b + res) > 0.999


def test_int8_conv_chain_matches_float_extractor(monkeypatch):
    """layer_norm-mode extractor with quantize=True + S3PRL_INT8_CONV=1
    routes through the int8 conv chain and matches the float path."""
    monkeypatch.setenv("S3PRL_INT8_CONV", "1")
    from s3prl_tpu.models.convfe import ConvFeatureExtractor

    layers = ((64, 10, 5), (64, 3, 2), (96, 3, 2), (64, 2, 2))
    rng = np.random.RandomState(6)
    wavs = jnp.asarray(rng.randn(2, 3200).astype(np.float32))

    ref_mod = ConvFeatureExtractor(layers, "layer_norm", False, jnp.float32)
    params = jax.jit(ref_mod.init)(jax.random.key(0), wavs)
    ref = ref_mod.apply(params, wavs)
    q_mod = ConvFeatureExtractor(layers, "layer_norm", False, jnp.float32,
                                 quantize=True)
    out = q_mod.apply(params, wavs)  # same param tree
    assert out.shape == ref.shape
    assert _cos(out, ref) > 0.999
    # training path must NOT take the (non-differentiable) chain
    out_tr = q_mod.apply(params, wavs, train=True,
                         rngs={"dropout": jax.random.key(1)})
    assert _cos(out_tr, ref) > 0.9999


def test_wavlm_serving_path_matches_float(monkeypatch):
    """WavLM with use_flash (gated-bias Pallas attention) + quantize matches
    the float XLA path per hidden state — including the fused-FFN
    quant_serving branch (forced available, kernels interpret on CPU)."""
    import s3prl_tpu.models.transformer as tr
    from s3prl_tpu.models.wavlm import WavLMConfig, WavLMModel

    monkeypatch.setattr(tr, "_fused_block_available", lambda: True)

    cfg = WavLMConfig(
        conv_feature_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
        encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
        encoder_attention_heads=4, conv_pos=16, conv_pos_groups=4,
        dropout=0.0, attention_dropout=0.0, dropout_input=0.0,
        num_buckets=32, max_distance=64,
    )
    wavs = jnp.asarray(np.random.RandomState(7).randn(2, 8000).astype(np.float32))
    lens = jnp.asarray([8000, 6000])
    m = WavLMModel(cfg)
    params = jax.jit(
        lambda k: m.init(k, wavs, lens, deterministic=True)
    )(jax.random.key(0))["params"]
    hs, _ = m.apply({"params": params}, wavs, lens, deterministic=True)
    mq = WavLMModel(cfg, use_flash=True, quantize=True)
    hs_q, _ = mq.apply({"params": params}, wavs, lens, deterministic=True)
    assert hs_q.shape == hs.shape
    for l in range(hs.shape[0]):
        assert _cos(hs_q[l], hs[l]) > 0.999, f"layer {l}"


def test_fused_block_matches_unfused_layer(monkeypatch):
    """The 4-kernel fused pre-LN serving block computes the same layer as
    the float module path (cosine, CPU interpret mode)."""
    import s3prl_tpu.models.transformer as tr

    C, H, F = 64, 4, 128
    layer = tr.EncoderLayer(
        embed_dim=C, ffn_dim=F, num_heads=H, layer_norm_first=True,
        dropout=0.0, attention_dropout=0.0, activation="gelu",
        use_flash=True, quantize=True,
    )
    float_layer = tr.EncoderLayer(
        embed_dim=C, ffn_dim=F, num_heads=H, layer_norm_first=True,
        dropout=0.0, attention_dropout=0.0, activation="gelu",
    )
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 11, C).astype(np.float32) * 0.5)
    pad = jnp.zeros((2, 11), bool).at[1, 8:].set(True)

    # identical param tree between the float and quantized modules
    params = float_layer.init(jax.random.key(0), x, pad)["params"]
    ref = float_layer.apply({"params": params}, x, pad)

    monkeypatch.setattr(tr, "_fused_block_available", lambda: True)
    out = layer.apply({"params": params}, x, pad)  # fused (interpret)
    # padded positions diverge (the fused path masks only in attention);
    # compare valid region
    assert _cos(out[0], ref[0]) > 0.999
    assert _cos(out[1, :8], ref[1, :8]) > 0.999


@pytest.mark.parametrize("preln", [False, True], ids=["postln", "preln"])
def test_wavlm_gated_outproj_fusion_matches_split(monkeypatch, preln):
    """gated_bias_attention_outproj (gated MHA + int8 out-proj + residual in
    one kernel, the WavLM serving default) computes the same layers as the
    split path (S3PRL_WAVLM_FUSE=0) in both LN orders."""
    import s3prl_tpu.models.transformer as tr
    from s3prl_tpu.models.wavlm import WavLMConfig, WavLMModel

    monkeypatch.setattr(tr, "_fused_block_available", lambda: True)

    cfg = WavLMConfig(
        conv_feature_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
        encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
        encoder_attention_heads=4, conv_pos=16, conv_pos_groups=4,
        dropout=0.0, attention_dropout=0.0, dropout_input=0.0,
        num_buckets=32, max_distance=64, layer_norm_first=preln,
        extractor_mode="layer_norm" if preln else "default",
    )
    wavs = jnp.asarray(np.random.RandomState(3).randn(2, 8000).astype(np.float32))
    lens = jnp.asarray([8000, 5000])
    m = WavLMModel(cfg, use_flash=True, quantize=True)
    params = jax.jit(
        lambda k: m.init(k, wavs, lens, deterministic=True)
    )(jax.random.key(0))["params"]

    hs_fused, _ = m.apply({"params": params}, wavs, lens, deterministic=True)
    monkeypatch.setenv("S3PRL_WAVLM_FUSE", "0")
    hs_split, _ = m.apply({"params": params}, wavs, lens, deterministic=True)
    assert hs_fused.shape == hs_split.shape
    for l in range(hs_fused.shape[0]):
        assert _cos(hs_fused[l], hs_split[l]) > 0.9999, f"layer {l}"


def test_qcache_matches_inline_quantization(monkeypatch):
    """The serving weight-quantization cache (ops/quant.cached_quantize_cols,
    materialized once at load — re-quantizing every forward measured
    +0.12 ms/layer on chip) must be numerically IDENTICAL to the inline
    fallback, and reusable across input shapes.

    Bit-equality holds with the static activation scales OFF (the qcache
    also carries calibrated per-layer activation scales, which change the
    attention block's requant numerics by design — that path is gated
    separately below and by the 24L cosine test)."""
    import s3prl_tpu.models.transformer as tr
    from s3prl_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Trunk

    monkeypatch.setattr(tr, "_fused_block_available", lambda: True)
    monkeypatch.setenv("S3PRL_STATIC_ACT", "0")
    cfg = Wav2Vec2Config(
        conv_feature_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
        encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
        encoder_attention_heads=4, conv_pos=16, conv_pos_groups=4,
        layer_norm_first=True, dropout=0.0, attention_dropout=0.0,
        dropout_input=0.0,
    )
    wavs = jnp.asarray(np.random.RandomState(3).randn(2, 6000).astype(np.float32))
    lens = jnp.asarray([6000, 4000])
    trunk = Wav2Vec2Trunk(cfg, quantize=True, use_flash=True)
    params = jax.jit(
        lambda k: Wav2Vec2Trunk(cfg).init(k, wavs, lens, deterministic=True)
    )(jax.random.key(0))["params"]

    hs_inline, _ = trunk.apply({"params": params}, wavs, lens, deterministic=True)
    (hs_mut, _), mut = trunk.apply({"params": params}, wavs, lens,
                                   deterministic=True, mutable=["qcache"])
    assert "qcache" in mut, "serving branches must populate the cache"
    leaves = jax.tree_util.tree_leaves(mut["qcache"])
    assert any(l.dtype == jnp.int8 for l in leaves)
    # stacked per layer by nn.scan
    names = mut["qcache"]["encoder"]["layers"]
    assert {"qkv_q8", "out_proj_q8", "fc1_q8", "fc2_q8"} <= set(names)
    assert names["fc1_q8"][0].shape == (2, 64, 128)  # [L, C, FFN] int8

    hs_cached, _ = trunk.apply({"params": params, "qcache": mut["qcache"]},
                               wavs, lens, deterministic=True)
    np.testing.assert_array_equal(np.asarray(hs_cached), np.asarray(hs_inline))
    np.testing.assert_array_equal(np.asarray(hs_mut), np.asarray(hs_inline))

    # the cache is shape-independent: reuse on a different batch/length
    wavs2 = jnp.asarray(np.random.RandomState(4).randn(1, 4800).astype(np.float32))
    lens2 = jnp.asarray([4800])
    a, _ = trunk.apply({"params": params, "qcache": mut["qcache"]},
                       wavs2, lens2, deterministic=True)
    b, _ = trunk.apply({"params": params}, wavs2, lens2, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qcache_static_activation_scales(monkeypatch):
    """With static activation scales ON (opt-in S3PRL_STATIC_ACT=1; measured
    a wash at the encoder level, tools/exp_static_act_ab.py), the qcache
    materialization pass calibrates per-layer (s_x, s_a) for the whole-block
    attention kernel (EncoderLayer._attn_act_scales); serving from the cache
    must be self-consistent (== the calibration pass) and stay close to the
    dynamic-per-row-scale path — the two differ only in int8 requant
    granularity."""
    import s3prl_tpu.models.transformer as tr
    from s3prl_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Trunk

    monkeypatch.setattr(tr, "_fused_block_available", lambda: True)
    monkeypatch.setenv("S3PRL_STATIC_ACT", "1")
    cfg = Wav2Vec2Config(
        conv_feature_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
        encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
        encoder_attention_heads=4, conv_pos=16, conv_pos_groups=4,
        layer_norm_first=True, dropout=0.0, attention_dropout=0.0,
        dropout_input=0.0,
    )
    wavs = jnp.asarray(np.random.RandomState(3).randn(2, 6000).astype(np.float32))
    lens = jnp.asarray([6000, 4000])
    trunk = Wav2Vec2Trunk(cfg, quantize=True, use_flash=True)
    params = jax.jit(
        lambda k: Wav2Vec2Trunk(cfg).init(k, wavs, lens, deterministic=True)
    )(jax.random.key(0))["params"]

    (hs_mut, _), mut = trunk.apply({"params": params}, wavs, lens,
                                   deterministic=True, mutable=["qcache"])
    names = mut["qcache"]["encoder"]["layers"]
    assert "attn_act_scales" in names, "static scales must be calibrated"
    scales = np.asarray(names["attn_act_scales"])
    assert scales.shape == (2, 2) and (scales > 0).all()  # [L, (s_x, s_a)]

    # serving from the cache reproduces the calibration pass exactly
    hs_cached, _ = trunk.apply({"params": params, "qcache": mut["qcache"]},
                               wavs, lens, deterministic=True)
    np.testing.assert_array_equal(np.asarray(hs_cached), np.asarray(hs_mut))

    # and stays close to the dynamic-scale path (same int8 pipeline, only
    # the requant granularity differs)
    monkeypatch.setenv("S3PRL_STATIC_ACT", "0")
    hs_dyn, _ = trunk.apply({"params": params}, wavs, lens, deterministic=True)
    a = np.asarray(hs_cached[-1], np.float32).reshape(-1)
    b = np.asarray(hs_dyn[-1], np.float32).reshape(-1)
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.995, cos


def test_hub_load_quantized_carries_qcache():
    """hub.load(quantize=True) must hand back variables that already carry
    the qcache collection so serving never re-quantizes weights."""
    from s3prl_tpu import hub

    up = hub.load("hubert", quantize=True)
    assert "qcache" in up.params
    # the cached path serves the standardized forward unchanged
    wavs = np.random.RandomState(5).randn(1, 8000).astype(np.float32)
    hs, _ = up.apply_standardized(up.params, wavs, np.asarray([8000], np.int32))
    assert hs.shape[0] == up.num_layers


def test_wavlm_long_audio_online_path_matches_whole_t(monkeypatch):
    """Long-audio WavLM serving (VERDICT r4 #7): beyond MAX_KERNEL_T the
    gated-bias attention routes to the K-blocked online kernel (pos_bias
    streamed in blocks, no [B,H,T,T] product). Shrinking MAX_KERNEL_T makes
    a CPU-sized input take the long-audio route through the FULL quantized
    model; the hidden states must match the whole-T kernel route."""
    import s3prl_tpu.kernels.flash_attention as fa
    import s3prl_tpu.models.transformer as tr
    from s3prl_tpu.models.wavlm import WavLMConfig, WavLMModel

    monkeypatch.setattr(tr, "_fused_block_available", lambda: True)

    cfg = WavLMConfig(
        conv_feature_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
        encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
        encoder_attention_heads=4, conv_pos=16, conv_pos_groups=4,
        dropout=0.0, attention_dropout=0.0, dropout_input=0.0,
        num_buckets=32, max_distance=64,
    )
    # 24000 samples -> 1200 frames: > the patched budget (long route), and
    # the online kernel's 1024-key blocks get a real multi-block K loop
    wavs = jnp.asarray(np.random.RandomState(7).randn(1, 24000).astype(np.float32))
    lens = jnp.asarray([24000])
    m = WavLMModel(cfg, use_flash=True, quantize=True)
    params = jax.jit(
        lambda k: m.init(k, wavs, lens, deterministic=True)
    )(jax.random.key(0))["params"]

    hs_whole, _ = m.apply({"params": params}, wavs, lens, deterministic=True)
    monkeypatch.setattr(fa, "MAX_KERNEL_T", 256)
    monkeypatch.setattr(fa, "MAX_BLOCK_T", 256)
    hs_online, _ = m.apply({"params": params}, wavs, lens, deterministic=True)
    assert hs_online.shape == hs_whole.shape
    for l in range(hs_whole.shape[0]):
        assert _cos(hs_online[l], hs_whole[l]) > 0.9999, f"layer {l}"


def test_hubert_base_postln_serving_quality(monkeypatch):
    """int8 quality at serving scale for the POST-LN family (round 5): the
    real HuBERT-Base config (12L, d=768, fairseq layer_norm_first=False)
    through the real serving path — postnorm whole-block kernels
    (LN in the kernel epilogue) + qcache — vs the float module path.
    Post-LN quantizes the RAW residual stream (no LN to tame outliers
    before the QKV/fc1 GEMMs), so full-depth error compounding needs its
    own gate; reference block order:
    s3prl/upstream/wav2vec2/wav2vec2_model.py TransformerSentenceEncoderLayer
    (layer_norm_first=False)."""
    import s3prl_tpu.models.transformer as tr
    from s3prl_tpu import hub

    up_f = hub.load("hubert_base")

    rng = np.random.RandomState(13)
    wavs = rng.randn(2, 8000).astype(np.float32)
    lens = np.asarray([8000, 6400], np.int32)
    hs_f, _ = jax.jit(up_f.apply_standardized)(up_f.params, wavs, lens)
    assert hs_f.shape[0] == 13 and hs_f.shape[-1] == 768

    monkeypatch.setattr(tr, "_fused_block_available", lambda: True)
    up_s = hub.load("hubert_base", quantize=True)
    assert "qcache" in up_s.params
    hs_s, _ = jax.jit(up_s.apply_standardized)(up_s.params, wavs, lens)
    worst = 1.0
    for l in range(hs_f.shape[0]):
        c = _cos(hs_s[l], hs_f[l])
        worst = min(worst, c)
        assert c > 0.999, f"serving path layer {l}: cos={c:.5f}"
    print(f"hubert-base 12L post-LN serving vs float: worst cos={worst:.5f}")

    # bf16 whole-block postnorm path (reference precision) rides the same
    # gate: routing must not change the numbers beyond bf16 rounding
    up_b = hub.load("hubert_base", dtype=jnp.bfloat16, flash=True)
    hs_b, _ = jax.jit(up_b.apply_standardized)(up_b.params, wavs, lens)
    for l in range(hs_f.shape[0]):
        assert _cos(hs_b[l], hs_f[l]) > 0.995, f"bf16 layer {l}"


def test_postln_long_t_split_path_matches_float(monkeypatch):
    """Post-LN int8 serving beyond MAX_BLOCK_T routes through the split
    path (int8 QKV on raw x + fused attention/out-proj/residual + XLA LN
    epilogue) — parity vs the float module path. MAX_BLOCK_T is patched
    down so the long-T branch fires at test shapes."""
    import s3prl_tpu.kernels.flash_attention as fa
    import s3prl_tpu.models.transformer as tr
    from s3prl_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Trunk

    monkeypatch.setattr(tr, "_fused_block_available", lambda: True)
    monkeypatch.setattr(fa, "MAX_BLOCK_T", 8)  # force the long-T branch
    cfg = Wav2Vec2Config(
        conv_feature_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
        encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
        encoder_attention_heads=4, conv_pos=16, conv_pos_groups=4,
        layer_norm_first=False, dropout=0.0, attention_dropout=0.0,
        dropout_input=0.0,
    )
    wavs = jnp.asarray(np.random.RandomState(17).randn(2, 6000).astype(np.float32))
    lens = jnp.asarray([6000, 4000])
    float_trunk = Wav2Vec2Trunk(cfg, quantize=False, use_flash=False)
    params = jax.jit(
        lambda key: float_trunk.init(key, wavs, lens, deterministic=True)
    )(jax.random.key(0))["params"]
    hs_ref, _ = float_trunk.apply({"params": params}, wavs, lens,
                                  deterministic=True)

    qtrunk = Wav2Vec2Trunk(cfg, quantize=True, use_flash=True)
    hs_q, _ = qtrunk.apply({"params": params}, wavs, lens,
                           deterministic=True)
    a = np.asarray(hs_ref[-1], np.float32).ravel()
    b = np.asarray(hs_q[-1], np.float32).ravel()
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.99, cos
