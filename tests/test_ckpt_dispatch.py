"""File-level checkpoint dispatch round-trips (VERDICT r4 next #3).

The per-family parity tests hand converted param trees to the model classes
in memory; until real checkpoints can be downloaded (egress), nothing
exercised the DISK path: torch.save'd checkpoint -> torch.load ->
cfg-from-ckpt -> loader dispatch -> the public ``hub.load(name, ckpt=path)``
entry. These tests save tiny reference torch models in the exact on-disk
layouts the real artifacts use and load them back through the public entry:

- wav2vec2/HuBERT family: the s3prl converted_ckpts layout
  ``{"task_cfg", "model_cfg", "model_weight"}``
  (reference: s3prl/upstream/wav2vec2/expert.py load path);
- WavLM: the official msft layout ``{"cfg", "model"}``
  (s3prl/upstream/wavlm/expert.py:22-27);
- DistilHuBERT: ``{"Distiller", "Config": {"distiller": ...}}``
  (s3prl/upstream/distiller/builder.py:41-59).

Hidden-state parity vs the torch oracle is asserted end to end, so a
loader-dispatch bug against the real dict layout (the class random-weight
parity cannot catch) fails here.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax.numpy as jnp

from s3prl_tpu import hub


def _compare(upstream, ref_hs, wavs, lens, atol=5e-4):
    hs, feat_lens = upstream.apply_fn(
        upstream.params, jnp.asarray(wavs), jnp.asarray(lens), False, None)
    hs, feat_lens = np.asarray(hs), np.asarray(feat_lens)
    assert hs.shape[0] == len(ref_hs)
    for l, ref in enumerate(ref_hs):
        T = min(ref.shape[1], hs.shape[2])
        for b, valid in enumerate(feat_lens):
            n = min(int(valid), T)
            np.testing.assert_allclose(
                hs[l, b, :n], ref[b, :n], atol=atol, err_msg=f"layer {l} b {b}")


def test_hubert_converted_ckpt_file_roundtrip(tmp_path):
    from test_torch_parity import TINY_CONV, _build_ref_hubert, _ref_hidden_states

    model, task_cfg = _build_ref_hubert("layer_norm", True)
    path = tmp_path / "hubert_tiny_converted.pt"
    # the exact converted_ckpts layout: model_cfg/task_cfg as plain dicts
    # (omegaconf containers resolve to dicts at torch.load time)
    torch.save({
        "task_cfg": {"normalize": True, "label_rate": 50},
        "model_cfg": {
            "_name": "hubert",
            "extractor_mode": "layer_norm",
            "encoder_layers": 3,
            "encoder_embed_dim": 64,
            "encoder_ffn_embed_dim": 128,
            "encoder_attention_heads": 4,
            "conv_feature_layers": TINY_CONV,
            "conv_pos": 16,
            "conv_pos_groups": 4,
            "layer_norm_first": True,
            "dropout": 0.0,
            "attention_dropout": 0.0,
            "activation_dropout": 0.0,
            "dropout_input": 0.0,
            "encoder_layerdrop": 0.0,
        },
        "model_weight": model.state_dict(),
    }, path)

    rng = np.random.RandomState(0)
    wav_a = rng.randn(16000).astype(np.float32)
    wav_b = rng.randn(10240).astype(np.float32)
    ref_hs = _ref_hidden_states(
        model, task_cfg, [torch.from_numpy(wav_a), torch.from_numpy(wav_b)])

    up = hub.load("hubert", ckpt=str(path))
    assert up.num_layers == 4 and up.hidden_size == 64  # cfg came from disk
    wavs = np.zeros((2, 16000), np.float32)
    wavs[0], wavs[1, :10240] = wav_a, wav_b
    _compare(up, ref_hs, wavs, [16000, 10240])


def test_wavlm_official_ckpt_file_roundtrip(tmp_path):
    from test_wavlm_parity import _build_ref_wavlm, _ref_hidden_states

    model, ref_cfg = _build_ref_wavlm("default", False)
    path = tmp_path / "wavlm_tiny.pt"
    # the official msft WavLM artifact layout {"cfg", "model"}
    torch.save({"cfg": dict(vars(ref_cfg)), "model": model.state_dict()}, path)

    rng = np.random.RandomState(1)
    wav_a = rng.randn(16000).astype(np.float32)
    wav_b = rng.randn(10240).astype(np.float32)
    ref_hs = _ref_hidden_states(
        model, ref_cfg, [torch.from_numpy(wav_a), torch.from_numpy(wav_b)])

    up = hub.load("wavlm", ckpt=str(path))
    assert up.hidden_size == ref_cfg.encoder_embed_dim
    wavs = np.zeros((2, 16000), np.float32)
    wavs[0], wavs[1, :10240] = wav_a, wav_b
    _compare(up, ref_hs, wavs, [16000, 10240])


def test_distilhubert_ckpt_file_roundtrip(tmp_path):
    from s3prl.upstream.distiller.model import (
        DistillerConfig as RefCfg,
        DistillerModel as RefModel,
    )

    torch.manual_seed(0)
    dcfg = {
        "extractor_conv_feature_layers": "[(64, 10, 5), (64, 3, 2), (64, 2, 2)]",
        "encoder_layers": 2,
        "encoder_embed_dim": 64,
        "encoder_ffn_embed_dim": 128,
        "encoder_attention_heads": 4,
        "conv_pos": 16,
        "conv_pos_groups": 4,
        "final_dim": 64,
        "n_tasks": 3,
        "pred_layer_id": [1, 2, 3],
        "out_layer_inter_dim": 32,
        "dropout": 0.0,
        "attention_dropout": 0.0,
        "activation_dropout": 0.0,
    }
    ref = RefModel(RefCfg(dcfg))
    ref.eval()
    path = tmp_path / "distiller_tiny.ckpt"
    # the distiller pretraining all_states layout
    torch.save({"Distiller": ref.state_dict(),
                "Config": {"distiller": dcfg}}, path)

    up = hub.load("distilhubert", ckpt=str(path))
    assert up.hidden_size == 64

    rng = np.random.RandomState(0)
    wav = rng.randn(2, 8000).astype(np.float32)
    lens = np.array([8000, 6000], np.int32)
    pad_mask = torch.arange(8000)[None] < torch.tensor(lens)[:, None]
    with torch.no_grad():
        feat, feat_final, pred, out_pad, layer_hiddens = ref(
            torch.from_numpy(wav), pad_mask.float(), get_hidden=True,
            no_pred=False)
    hs, feat_lens = up.apply_fn(
        up.params, jnp.asarray(wav), jnp.asarray(lens), False, None)
    hs, feat_lens = np.asarray(hs), np.asarray(feat_lens)
    # spot-check against the torch oracle: hs[0] = feat_final, the last
    # encoder layer hidden rides at hs[cfg.encoder_layers]
    # (layout pinned fully in tests/test_distiller_parity.py)
    ref_final = feat_final.numpy()
    n = min(int(feat_lens[0]), ref_final.shape[1])
    np.testing.assert_allclose(hs[0, 0, :n], ref_final[0, :n], atol=5e-4)
    np.testing.assert_allclose(hs[2, 0, :n], layer_hiddens[-1].numpy()[0, :n],
                               atol=5e-4)
