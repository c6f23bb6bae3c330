"""WavLM parity vs the reference (vendored Microsoft) implementation.

Same strategy as test_torch_parity: build the reference torch WavLM with a
tiny random-init config, convert weights, assert per-layer hidden states
match — covering the bucketed relative position bias and the per-layer
gru_rel_pos gating.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from s3prl_tpu.models.wavlm import WavLMConfig, WavLMModel
from s3prl_tpu.upstream.convert import wavlm_params_from_torch

TINY = dict(
    encoder_layers=3,
    encoder_embed_dim=64,
    encoder_ffn_embed_dim=128,
    encoder_attention_heads=4,
    conv_feature_layers="[(64, 10, 5), (64, 3, 2), (64, 2, 2)]",
    conv_pos=16,
    conv_pos_groups=4,
    dropout=0.0,
    attention_dropout=0.0,
    activation_dropout=0.0,
    dropout_input=0.0,
    dropout_features=0.0,
    encoder_layerdrop=0.0,
    relative_position_embedding=True,
    num_buckets=32,
    max_distance=80,
    gru_rel_pos=True,
)


def _build_ref_wavlm(extractor_mode: str, layer_norm_first: bool, seed: int = 0):
    from s3prl.upstream.wavlm.WavLM import WavLM, WavLMConfig as RefCfg

    torch.manual_seed(seed)
    cfg = RefCfg()
    for k, v in TINY.items():
        setattr(cfg, k, v)
    cfg.extractor_mode = extractor_mode
    cfg.layer_norm_first = layer_norm_first
    cfg.normalize = extractor_mode == "layer_norm"
    model = WavLM(cfg)
    model.eval()
    return model, cfg


def _ref_hidden_states(model, cfg, wavs_list):
    captured = []
    hooks = []
    for layer in model.encoder.layers:
        hooks.append(
            layer.register_forward_pre_hook(
                lambda mod, inp: captured.append(inp[0].transpose(0, 1).detach())
            )
        )
    if cfg.normalize:
        wavs_list = [torch.nn.functional.layer_norm(w, w.shape) for w in wavs_list]
    lens = torch.LongTensor([len(w) for w in wavs_list])
    padded = torch.nn.utils.rnn.pad_sequence(wavs_list, batch_first=True)
    pad_mask = ~(torch.arange(padded.size(1))[None] < lens[:, None])
    with torch.no_grad():
        x, _ = model.extract_features(padded, padding_mask=pad_mask, mask=False)
    captured.append(x.detach())
    for h in hooks:
        h.remove()
    unpad = min(h.size(1) for h in captured)
    return [h[:, :unpad].numpy() for h in captured]


LARGE = dict(
    encoder_layers=24,
    encoder_embed_dim=1024,
    encoder_ffn_embed_dim=4096,
    encoder_attention_heads=16,
    conv_feature_layers="[(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2",
    conv_pos=128,
    conv_pos_groups=16,
    dropout=0.0,
    attention_dropout=0.0,
    activation_dropout=0.0,
    dropout_input=0.0,
    dropout_features=0.0,
    encoder_layerdrop=0.0,
    relative_position_embedding=True,
    num_buckets=320,
    max_distance=800,
    gru_rel_pos=True,
)


@pytest.mark.slow
def test_wavlm_large_full_size_parity():
    """Random-weight parity at the REAL WavLM-Large geometry (24L x 1024,
    conv_pos 128/16, buckets 320/800) — de-risks scale-dependent conversion
    bugs (head-dim reshapes, bucket tables, 7-layer conv stack) ahead of
    the egress-gated real-checkpoint regression (VERDICT r3 #8). Tolerance
    follows the reference's own parity budget (atol=0.01,
    /root/reference/test/test_upstream.py:22-26) — 24 fp32 layers of
    reduction-order noise sit well inside it; a conversion bug does not."""
    model, ref_cfg = _build_ref_wavlm_cfg(LARGE, "layer_norm", True)

    rng = np.random.RandomState(1)
    wav_a = rng.randn(16000).astype(np.float32)
    wav_b = rng.randn(10240).astype(np.float32)
    ref_hs = _ref_hidden_states(
        model, ref_cfg, [torch.from_numpy(wav_a), torch.from_numpy(wav_b)]
    )

    cfg = WavLMConfig(
        extractor_mode="layer_norm",
        conv_feature_layers=tuple([(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2),
        encoder_layers=24,
        encoder_embed_dim=1024,
        encoder_ffn_embed_dim=4096,
        encoder_attention_heads=16,
        conv_pos=128,
        conv_pos_groups=16,
        layer_norm_first=True,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        dropout_input=0.0,
        normalize=True,
        relative_position_embedding=True,
        num_buckets=320,
        max_distance=800,
        gru_rel_pos=True,
    )
    params = wavlm_params_from_torch(model.state_dict(), cfg)
    ours = WavLMModel(cfg)

    wavs = np.zeros((2, 16000), np.float32)
    wavs[0], wavs[1, :10240] = wav_a, wav_b
    hs, feat_lens = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(wavs),
        jnp.asarray([16000, 10240]),
        deterministic=True,
    )
    hs = np.asarray(hs)
    feat_lens = np.asarray(feat_lens)

    assert len(ref_hs) == hs.shape[0] == 25
    for l, ref in enumerate(ref_hs):
        T = min(ref.shape[1], hs.shape[2])
        for b, valid in enumerate(feat_lens):
            n = min(int(valid), T)
            a, r = hs[l, b, :n].astype(np.float64), ref[b, :n].astype(np.float64)
            cos = (a * r).sum() / np.sqrt((a**2).sum() * (r**2).sum())
            assert cos > 0.9999, f"layer {l} batch {b} cosine {cos}"
            np.testing.assert_allclose(
                a, r, atol=0.01, err_msg=f"layer {l} batch {b} (large full-size)"
            )


def _build_ref_wavlm_cfg(overrides: dict, extractor_mode: str,
                         layer_norm_first: bool, seed: int = 0):
    from s3prl.upstream.wavlm.WavLM import WavLM, WavLMConfig as RefCfg

    torch.manual_seed(seed)
    cfg = RefCfg()
    for k, v in overrides.items():
        setattr(cfg, k, v)
    cfg.extractor_mode = extractor_mode
    cfg.layer_norm_first = layer_norm_first
    cfg.normalize = extractor_mode == "layer_norm"
    model = WavLM(cfg)
    model.eval()
    return model, cfg


@pytest.mark.parametrize(
    "extractor_mode,layer_norm_first",
    [("default", False), ("layer_norm", True)],
    ids=["base-style", "large-style"],
)
def test_wavlm_parity(extractor_mode, layer_norm_first):
    model, ref_cfg = _build_ref_wavlm(extractor_mode, layer_norm_first)

    rng = np.random.RandomState(0)
    wav_a = rng.randn(16000).astype(np.float32)
    wav_b = rng.randn(10240).astype(np.float32)
    ref_hs = _ref_hidden_states(
        model, ref_cfg, [torch.from_numpy(wav_a), torch.from_numpy(wav_b)]
    )

    cfg = WavLMConfig(
        extractor_mode=extractor_mode,
        conv_feature_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
        encoder_layers=3,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        conv_pos=16,
        conv_pos_groups=4,
        layer_norm_first=layer_norm_first,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        dropout_input=0.0,
        normalize=ref_cfg.normalize,
        relative_position_embedding=True,
        num_buckets=32,
        max_distance=80,
        gru_rel_pos=True,
    )
    params = wavlm_params_from_torch(model.state_dict(), cfg)
    ours = WavLMModel(cfg)

    wavs = np.zeros((2, 16000), np.float32)
    wavs[0], wavs[1, :10240] = wav_a, wav_b
    hs, feat_lens = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(wavs),
        jnp.asarray([16000, 10240]),
        deterministic=True,
    )
    hs = np.asarray(hs)
    feat_lens = np.asarray(feat_lens)

    assert len(ref_hs) == hs.shape[0] == 4
    for l, ref in enumerate(ref_hs):
        T = min(ref.shape[1], hs.shape[2])
        for b, valid in enumerate(feat_lens):
            n = min(int(valid), T)
            np.testing.assert_allclose(
                hs[l, b, :n], ref[b, :n], atol=5e-4,
                err_msg=f"layer {l} batch {b} ({extractor_mode})",
            )
