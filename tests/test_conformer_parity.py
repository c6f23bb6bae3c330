"""Conformer-encoder wav2vec2 parity vs the reference (random init).

Covers the ESPnet attention variants the published conformer checkpoints
use (LL_relpos / LL_rope): Transformer-XL relative positions with the
rel-shift trick, and rotary embeddings applied to the pre-projection input
(the reference's unusual-but-canonical ordering)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from s3prl_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Trunk
from s3prl_tpu.upstream.convert import conformer_trunk_variables_from_torch

TINY_CONV = "[(64, 10, 5), (64, 3, 2), (64, 2, 2)]"
TINY_CONV_TUPLE = ((64, 10, 5), (64, 3, 2), (64, 2, 2))


@pytest.mark.parametrize("pos_enc", ["rel_pos", "rope"])
def test_conformer_trunk_parity(pos_enc):
    from s3prl.upstream.wav2vec2.wav2vec2_model import (
        Wav2Vec2Config as RefCfg,
        Wav2Vec2Model as RefModel,
    )

    torch.manual_seed(0)
    ref_cfg = RefCfg(
        layer_type="conformer",
        attn_type="espnet",
        pos_enc_type=pos_enc,
        fp16=False,
        extractor_mode="layer_norm",
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        depthwise_conv_kernel_size=31,
        conv_feature_layers=TINY_CONV,
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

    rng = np.random.RandomState(0)
    wav_a = rng.randn(16000).astype(np.float32)
    wav_b = rng.randn(10240).astype(np.float32)
    wavs = [torch.from_numpy(wav_a), torch.from_numpy(wav_b)]
    # conformer entries normalize (Large-style task cfg)
    wavs = [torch.nn.functional.layer_norm(w, w.shape) for w in wavs]
    lens = torch.LongTensor([len(w) for w in wavs])
    padded = torch.nn.utils.rnn.pad_sequence(wavs, batch_first=True)
    pad_mask = ~(torch.arange(padded.size(1))[None] < lens[:, None])
    with torch.no_grad():
        res = ref.extract_features(padded, padding_mask=pad_mask, mask=False)
    ref_out = res["x"].numpy()
    ref_feat_pad = res["padding_mask"]

    cfg = Wav2Vec2Config(
        layer_type="conformer",
        pos_enc_type=pos_enc,
        feat_pad_rule="conv",  # the wav2vec2 model class's length rule
        extractor_mode="layer_norm",
        conv_feature_layers=TINY_CONV_TUPLE,
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        layer_norm_first=False,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        dropout_input=0.0,
        normalize=True,
    )
    variables = conformer_trunk_variables_from_torch(ref.state_dict(), cfg)
    ours = Wav2Vec2Trunk(cfg)
    wavs_np = np.zeros((2, 16000), np.float32)
    wavs_np[0] = wav_a
    wavs_np[1, :10240] = wav_b
    hs, feat_lens = ours.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(wavs_np), jnp.asarray([16000, 10240]), deterministic=True,
    )
    hs = np.asarray(hs)
    feat_lens = np.asarray(feat_lens)
    T = min(hs.shape[2], ref_out.shape[1])
    for b in range(2):
        n = min(int(feat_lens[b]), T)
        np.testing.assert_allclose(
            hs[-1, b, :n], ref_out[b, :n], atol=1e-3, err_msg=f"b {b}"
        )


@pytest.mark.parametrize("pos_enc", ["rel_pos", "rope"])
def test_conformer_ckpt_roundtrip(tmp_path, pos_enc):
    """hub.load('wav2vec2_conformer[_rope]', ckpt=...) consumes a converted
    {"task_cfg","model_cfg","model_weight"} ckpt and matches the reference
    top layer (the published LL_relpos/LL_rope layout)."""
    from s3prl.upstream.wav2vec2.wav2vec2_model import (
        Wav2Vec2Config as RefCfg,
        Wav2Vec2Model as RefModel,
    )

    torch.manual_seed(7)
    model_cfg = dict(
        _name="wav2vec2",
        layer_type="conformer",
        attn_type="espnet",
        pos_enc_type=pos_enc,
        fp16=False,
        extractor_mode="layer_norm",
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        depthwise_conv_kernel_size=31,
        conv_feature_layers=TINY_CONV,
        layer_norm_first=False,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        dropout_input=0.0,
        dropout_features=0.0,
        encoder_layerdrop=0.0,
    )
    ref = RefModel(RefCfg(**{k: v for k, v in model_cfg.items() if k != "_name"}))
    ref.eval()

    path = tmp_path / "conformer.pt"
    torch.save(
        {
            "task_cfg": {"normalize": True},
            "model_cfg": model_cfg,
            "model_weight": ref.state_dict(),
        },
        path,
    )

    rng = np.random.RandomState(1)
    wav = rng.randn(1, 8000).astype(np.float32)
    wav_t = torch.nn.functional.layer_norm(
        torch.from_numpy(wav[0]), wav[0].shape
    ).unsqueeze(0)
    with torch.no_grad():
        res = ref.extract_features(wav_t, padding_mask=None, mask=False)
    ref_out = res["x"].numpy()

    from s3prl_tpu import hub

    name = "wav2vec2_conformer_rope" if pos_enc == "rope" else "wav2vec2_conformer"
    up = hub.load(name, ckpt=str(path))
    hs, feat_lens = up.apply_standardized(
        up.params, jnp.asarray(wav), jnp.asarray([8000])
    )
    hs = np.asarray(hs)
    assert hs.shape[0] == up.num_layers == 3  # 2 layers + extractor state
    n = min(int(np.asarray(feat_lens)[0]), ref_out.shape[1])
    np.testing.assert_allclose(hs[-1, 0, :n], ref_out[0, :n], atol=1e-3)
