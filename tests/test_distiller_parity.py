"""DistilHuBERT parity vs the reference DistillerModel (random init)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from s3prl_tpu.models.distiller import DistillerConfig, DistillerModel
from s3prl_tpu.upstream.convert import distiller_params_from_torch


def test_distiller_parity():
    from s3prl.upstream.distiller.model import (
        DistillerConfig as RefCfg,
        DistillerModel as RefModel,
    )

    torch.manual_seed(0)
    ref_cfg = RefCfg(
        {
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
    )
    ref = RefModel(ref_cfg)
    ref.eval()

    rng = np.random.RandomState(0)
    wav = rng.randn(2, 8000).astype(np.float32)
    lens = np.array([8000, 6000], np.int32)
    pad_mask = torch.arange(8000)[None] < torch.tensor(lens)[:, None]
    with torch.no_grad():
        feat, feat_final, pred, out_pad, layer_hiddens = ref(
            torch.from_numpy(wav), pad_mask.float(), get_hidden=True, no_pred=False
        )
    ref_hs = [feat_final.numpy()] + [h.numpy() for h in layer_hiddens] + [
        p.squeeze(0).numpy() for p in pred.transpose(0, 1).split(1, 0)
    ]

    cfg = DistillerConfig(
        conv_feature_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        conv_pos=16,
        conv_pos_groups=4,
        final_dim=64,
        n_tasks=3,
        out_layer_inter_dim=32,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
    )
    params = distiller_params_from_torch(ref.state_dict(), cfg)
    ours = DistillerModel(cfg)
    hs, feat_lens = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(wav), jnp.asarray(lens), deterministic=True,
    )
    hs = np.asarray(hs)
    assert hs.shape[0] == len(ref_hs) == 1 + 2 + 3
    feat_lens = np.asarray(feat_lens)
    for l, ref_layer in enumerate(ref_hs):
        T = min(ref_layer.shape[1], hs.shape[2])
        for b in range(2):
            # distiller's cal_pad_mask rounds the boundary frame differently
            # from the hubert rule; compare within the reference's own
            # frame-slack budget (test_upstream.py:22-26 allows 3)
            n = min(int(feat_lens[b]), T) - 1
            np.testing.assert_allclose(
                hs[l, b, :n], ref_layer[b, :n], atol=5e-4, err_msg=f"state {l} b {b}"
            )


def test_distiller_ckpt_roundtrip(tmp_path):
    """hub.load('distilhubert', ckpt=...) consumes a distiller pretraining
    ckpt ({"Distiller","Config"}, reference builder.py:41-59)."""
    from s3prl.upstream.distiller.model import (
        DistillerConfig as RefCfg,
        DistillerModel as RefModel,
    )

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
    }
    torch.manual_seed(2)
    ref = RefModel(RefCfg(dcfg))
    path = tmp_path / "distiller.ckpt"
    torch.save({"Distiller": ref.state_dict(), "Config": {"distiller": dcfg}}, path)

    from s3prl_tpu import hub

    up = hub.load("distilhubert", ckpt=str(path))
    wav = np.random.RandomState(0).randn(1, 8000).astype(np.float32)
    hs, _ = up.apply_standardized(up.params, jnp.asarray(wav), jnp.asarray([8000]))
    assert hs.shape[0] == up.num_layers == 1 + 2 + 3
    assert hs.shape[-1] == up.hidden_size == 64
