"""RoBERTa parity vs the reference fairseq-free RobertaModel (random init)."""

import argparse
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

# omegaconf is stubbed centrally in conftest.py when absent

import jax
import jax.numpy as jnp

from s3prl_tpu.models.roberta import RobertaConfig, RobertaModel
from s3prl_tpu.upstream.convert import parse_fairseq_dictionary, roberta_params_from_torch


def _build_ref(num_symbols=20, seed=0):
    from s3prl.upstream.roberta.dictionary import Dictionary
    from s3prl.upstream.roberta.roberta_model import (
        RobertaEncoder,
        RobertaModel as RefRoberta,
        base_architecture,
    )

    d = Dictionary()
    for i in range(num_symbols):
        d.add_symbol(f"{i}-{i + 1}")
    d.add_symbol("<mask>")

    args = argparse.Namespace(
        encoder_layers=2,
        encoder_embed_dim=32,
        encoder_ffn_embed_dim=64,
        encoder_attention_heads=4,
        max_positions=64,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        pooler_dropout=0.0,
        untie_weights_roberta=False,
        token_dropout=False,
    )
    base_architecture(args)
    args.max_positions = 64
    args.max_source_positions = 64

    torch.manual_seed(seed)
    encoder = RobertaEncoder(args, d)
    model = RefRoberta(args, encoder)
    model.eval()
    return model, d


def test_roberta_parity():
    ref, d = _build_ref()

    rng = np.random.RandomState(0)
    B, T = 2, 12
    vocab = len(d)
    tokens = rng.randint(4, vocab, size=(B, T)).astype(np.int64)
    lens = np.array([12, 8], np.int32)
    tokens_t = torch.from_numpy(tokens.copy())
    tokens_t[1, 8:] = d.pad()

    with torch.no_grad():
        _, extra = ref(tokens_t, features_only=True, return_all_hiddens=True)
    ref_hs = [h.transpose(0, 1).numpy() for h in extra["inner_states"]]

    cfg = RobertaConfig(
        vocab_size=vocab, max_positions=64, hidden_size=32, num_layers=2,
        num_heads=4, ffn_size=64, dropout=0.0, attention_dropout=0.0,
    )
    params = roberta_params_from_torch(ref.state_dict(), cfg.num_layers)
    ours = RobertaModel(cfg)
    hs, _ = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(tokens.astype(np.int32)), jnp.asarray(lens), deterministic=True,
    )
    hs = np.asarray(hs)
    assert hs.shape[0] == len(ref_hs) == cfg.num_layers + 1
    for l, ref_layer in enumerate(ref_hs):
        for b, n in enumerate(lens):
            np.testing.assert_allclose(
                hs[l, b, :n], ref_layer[b, :n], atol=5e-4, err_msg=f"state {l} b {b}"
            )


def test_parse_fairseq_dictionary():
    text = "5-6 100\n1-2 50\nmadeupword0000 0\n"
    lookup, vocab = parse_fairseq_dictionary(text, num_codes=8)
    assert lookup[5, 6] == 4
    assert lookup[1, 2] == 5
    assert lookup[0, 0] == 3  # unk
    assert vocab == 4 + 3 + 1  # specials + lines + <mask>


def test_roberta_pipeline_ckpt_roundtrip(tmp_path):
    """hub.load('vq_wav2vec_kmeans_roberta', ckpt=..., frontend_ckpt=...)."""
    from s3prl.upstream.wav2vec.wav2vec_model import Wav2VecConfig, Wav2VecModel

    ref_rob, d = _build_ref(num_symbols=16 * 16, seed=1)
    rob_path = tmp_path / "roberta.pt"
    dict_text = "\n".join(f"{i}-{i + 1} 1" for i in range(16 * 16))
    torch.save(
        {
            "task_cfg": {},
            "model_cfg": argparse.Namespace(
                encoder_layers=2, encoder_embed_dim=32,
                encoder_ffn_embed_dim=64, encoder_attention_heads=4,
            ),
            "model_weight": ref_rob.state_dict(),
            "text_dictionary": dict_text,
        },
        rob_path,
    )

    torch.manual_seed(2)
    w2v_cfg = Wav2VecConfig(
        infonce=False,
        conv_feature_layers="[(32, 10, 5), (32, 8, 4), (32, 4, 2)]",
        conv_aggregator_layers="[(32, 2, 1), (32, 3, 1)]",
        dropout=0.0, dropout_features=0.0, dropout_agg=0.0,
        vq_type="kmeans", vq_vars=16, vq_groups=2, vq_dim=32,
    )
    ref_w2v = Wav2VecModel(w2v_cfg)
    w2v_path = tmp_path / "vq.pt"
    torch.save(
        {
            "task_cfg": {},
            "model_cfg": {
                "conv_feature_layers": w2v_cfg.conv_feature_layers,
                "conv_aggregator_layers": w2v_cfg.conv_aggregator_layers,
                "vq_type": "kmeans", "vq_vars": 16, "vq_groups": 2, "vq_dim": 32,
            },
            "model_weight": ref_w2v.state_dict(),
        },
        w2v_path,
    )

    from s3prl_tpu import hub

    up = hub.load(
        "vq_wav2vec_kmeans_roberta", ckpt=str(rob_path), frontend_ckpt=str(w2v_path)
    )
    wav = np.random.RandomState(0).randn(1, 4000).astype(np.float32)
    hs, lens = up.apply_standardized(up.params, jnp.asarray(wav), jnp.asarray([4000]))
    assert hs.shape[0] == up.num_layers == 3
    assert hs.shape[-1] == 32
    assert np.isfinite(np.asarray(hs)).all()
