"""Numerical parity vs the reference PyTorch implementation.

The reference's flagship test pattern (test/test_upstream.py:85-96) compares
every upstream against stored ground-truth hidden states at atol=0.01. Here
we go one better: build the reference torch model (randomly initialized),
convert its weights with s3prl_tpu.upstream.convert, and assert per-layer
hidden-state parity of our JAX trunk on mixed-length batches — weight
conversion, architecture, and length semantics all verified at once.

Only reference *outputs* are consumed (imported as a library); no reference
code is copied.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from s3prl_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Trunk
from s3prl_tpu.upstream.convert import trunk_params_from_torch

TINY_CONV = "[(64, 10, 5), (64, 3, 2), (64, 2, 2)]"
TINY_CONV_TUPLE = ((64, 10, 5), (64, 3, 2), (64, 2, 2))


def _build_ref_hubert(extractor_mode: str, layer_norm_first: bool, seed: int = 0):
    from s3prl.upstream.hubert.hubert_model import (
        HubertConfig,
        HubertModel,
        HubertPretrainingConfig,
    )

    torch.manual_seed(seed)
    cfg = HubertConfig(
        label_rate=50,
        extractor_mode=extractor_mode,
        encoder_layers=3,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        conv_feature_layers=TINY_CONV,
        conv_pos=16,
        conv_pos_groups=4,
        layer_norm_first=layer_norm_first,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        dropout_input=0.0,
        dropout_features=0.0,
        encoder_layerdrop=0.0,
    )
    task_cfg = HubertPretrainingConfig(label_rate=50, normalize=extractor_mode == "layer_norm")
    model = HubertModel(cfg, task_cfg, [None])
    model.eval()
    return model, task_cfg


def _ref_hidden_states(model, task_cfg, wavs_list):
    """Reproduce the reference expert's hook capture (hubert/expert.py:36-51)."""
    captured = []
    hooks = []
    for layer in model.encoder.layers:
        hooks.append(
            layer.register_forward_pre_hook(
                lambda mod, inp: captured.append(inp[0].transpose(0, 1).detach())
            )
        )
    if task_cfg.normalize:
        wavs_list = [torch.nn.functional.layer_norm(w, w.shape) for w in wavs_list]
    lens = torch.LongTensor([len(w) for w in wavs_list])
    padded = torch.nn.utils.rnn.pad_sequence(wavs_list, batch_first=True)
    pad_mask = ~(torch.arange(padded.size(1))[None] < lens[:, None])
    with torch.no_grad():
        x, _ = model.extract_features(padded, padding_mask=pad_mask, mask=False)
    captured.append(x.detach())
    for h in hooks:
        h.remove()
    # reference postprocess trims all layers to the min length (expert.py:46-50)
    unpad = min(h.size(1) for h in captured)
    return [h[:, :unpad].numpy() for h in captured]


@pytest.mark.parametrize(
    "extractor_mode,layer_norm_first",
    [("default", False), ("layer_norm", True)],
    ids=["base-style", "large-style"],
)
def test_hubert_trunk_parity(extractor_mode, layer_norm_first):
    model, task_cfg = _build_ref_hubert(extractor_mode, layer_norm_first)

    rng = np.random.RandomState(0)
    wav_a = rng.randn(16000).astype(np.float32)
    wav_b = rng.randn(10240).astype(np.float32)
    ref_hs = _ref_hidden_states(
        model, task_cfg, [torch.from_numpy(wav_a), torch.from_numpy(wav_b)]
    )

    cfg = Wav2Vec2Config(
        extractor_mode=extractor_mode,
        conv_feature_layers=TINY_CONV_TUPLE,
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
        normalize=task_cfg.normalize,
    )
    params = trunk_params_from_torch(model.state_dict(), cfg)
    trunk = Wav2Vec2Trunk(cfg)

    wavs = np.zeros((2, 16000), np.float32)
    wavs[0], wavs[1, :10240] = wav_a, wav_b
    lens = jnp.asarray([16000, 10240])
    hs, feat_lens = trunk.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(wavs),
        lens,
        deterministic=True,
    )
    hs = np.asarray(hs)
    feat_lens = np.asarray(feat_lens)

    assert len(ref_hs) == hs.shape[0] == 4  # 3 layer inputs + final
    for l, ref in enumerate(ref_hs):
        T = min(ref.shape[1], hs.shape[2])
        for b, valid in enumerate(feat_lens):
            n = min(int(valid), T)
            np.testing.assert_allclose(
                hs[l, b, :n], ref[b, :n], atol=5e-4,
                err_msg=f"layer {l} batch {b} ({extractor_mode})",
            )


def test_wav2vec2_model_parity():
    """The wav2vec2 model class (vs hubert) derives feature lengths with
    strict conv arithmetic (wav2vec2_model.py:2610-2669); verify per-layer
    parity on mixed lengths with feat_pad_rule='conv'."""
    from s3prl.upstream.wav2vec2.wav2vec2_model import (
        Wav2Vec2Config as RefCfg,
        Wav2Vec2Model as RefModel,
    )

    torch.manual_seed(3)
    ref_cfg = RefCfg(
        extractor_mode="default",
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        conv_feature_layers=TINY_CONV,
        conv_pos=16,
        conv_pos_groups=4,
        layer_norm_first=False,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        dropout_input=0.0,
        dropout_features=0.0,
        encoder_layerdrop=0.0,
    )
    ref = RefModel(ref_cfg)
    ref.eval()

    rng = np.random.RandomState(3)
    wav_a = rng.randn(16000).astype(np.float32)
    wav_b = rng.randn(10240).astype(np.float32)
    lens = torch.LongTensor([16000, 10240])
    padded = torch.nn.utils.rnn.pad_sequence(
        [torch.from_numpy(wav_a), torch.from_numpy(wav_b)], batch_first=True
    )
    pad_mask = ~(torch.arange(padded.size(1))[None] < lens[:, None])
    with torch.no_grad():
        res = ref.extract_features(padded, padding_mask=pad_mask, mask=False)
    ref_out = res["x"].numpy()
    ref_valid = (~res["padding_mask"]).sum(-1).numpy()

    cfg = Wav2Vec2Config(
        extractor_mode="default",
        conv_feature_layers=TINY_CONV_TUPLE,
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        conv_pos=16,
        conv_pos_groups=4,
        layer_norm_first=False,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        dropout_input=0.0,
        feat_pad_rule="conv",
    )
    params = trunk_params_from_torch(ref.state_dict(), cfg)
    ours = Wav2Vec2Trunk(cfg)
    wavs = np.zeros((2, 16000), np.float32)
    wavs[0] = wav_a
    wavs[1, :10240] = wav_b
    hs, feat_lens = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(wavs), jnp.asarray([16000, 10240]), deterministic=True,
    )
    hs = np.asarray(hs)
    feat_lens = np.asarray(feat_lens)
    np.testing.assert_array_equal(feat_lens, ref_valid)  # the length rule
    T = min(hs.shape[2], ref_out.shape[1])
    for b in range(2):
        n = min(int(feat_lens[b]), T)
        np.testing.assert_allclose(
            hs[-1, b, :n], ref_out[b, :n], atol=5e-4, err_msg=f"b {b}"
        )
