"""data2vec parity vs the reference Data2VecAudioModel (random init)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

# omegaconf is stubbed centrally in conftest.py when absent

import jax
import jax.numpy as jnp

from s3prl_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Trunk
from s3prl_tpu.upstream.convert import trunk_params_from_torch


def test_data2vec_parity():
    from s3prl.upstream.data2vec.data2vec_model import (
        Data2VecAudioConfig,
        Data2VecAudioModel,
    )

    torch.manual_seed(0)
    cfg_ref = Data2VecAudioConfig(
        extractor_mode="layer_norm",
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        conv_feature_layers="[(64, 10, 5), (64, 3, 2), (64, 2, 2)]",
        conv_pos=12,
        conv_pos_groups=4,
        pos_conv_depth=3,
        layer_norm_first=False,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        dropout_input=0.0,
        dropout_features=0.0,
        encoder_layerdrop=0.0,
    )
    ref = Data2VecAudioModel(cfg_ref)
    ref.eval()

    rng = np.random.RandomState(0)
    wav_a = rng.randn(12000).astype(np.float32)
    wav_b = rng.randn(8000).astype(np.float32)
    lens = np.array([12000, 8000])
    padded = np.zeros((2, 12000), np.float32)
    padded[0], padded[1, :8000] = wav_a, wav_b
    pad_mask = ~(torch.arange(12000)[None] < torch.tensor(lens)[:, None])

    captured = []
    hooks = [
        layer.register_forward_pre_hook(
            lambda mod, inp: captured.append(inp[0].transpose(0, 1).detach())
        )
        for layer in ref.encoder.layers
    ]
    with torch.no_grad():
        res = ref.extract_features(
            torch.from_numpy(padded), padding_mask=pad_mask, mask=False
        )
    captured.append(res["x"].detach())
    for h in hooks:
        h.remove()
    unpad = min(h.size(1) for h in captured)
    ref_hs = [h[:, :unpad].numpy() for h in captured]

    cfg = Wav2Vec2Config(
        extractor_mode="layer_norm",
        conv_feature_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
        encoder_layers=2, encoder_embed_dim=64,
        encoder_ffn_embed_dim=128, encoder_attention_heads=4,
        conv_pos=12, conv_pos_groups=4, pos_conv_depth=3,
        layer_norm_first=False, dropout=0.0, attention_dropout=0.0,
        dropout_input=0.0, normalize=False,
        post_extract_proj_always=True, feat_pad_rule="conv",
    )
    params = trunk_params_from_torch(ref.state_dict(), cfg)
    ours = Wav2Vec2Trunk(cfg)
    hs, feat_lens = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(padded), jnp.asarray(lens), deterministic=True,
    )
    hs = np.asarray(hs)
    feat_lens = np.asarray(feat_lens)
    assert hs.shape[0] == len(ref_hs) == 3
    for l, ref_layer in enumerate(ref_hs):
        T = min(ref_layer.shape[1], hs.shape[2])
        for b in range(2):
            n = min(int(feat_lens[b]), T)
            np.testing.assert_allclose(
                hs[l, b, :n], ref_layer[b, :n], atol=5e-4, err_msg=f"layer {l} b {b}"
            )
