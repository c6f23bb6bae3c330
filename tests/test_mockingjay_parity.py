"""Mockingjay/TERA encoder parity vs the reference TransformerModel.

Feeds identical features through the reference torch model (random init,
converted weights) and our MockingjayEncoder; asserts every encoded layer
matches. Covers the BERT block, sinusoid position encoding, and masking.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from s3prl_tpu.models.mockingjay import MockingjayConfig, MockingjayEncoder, sinusoid_table
from s3prl_tpu.upstream.convert import mockingjay_params_from_torch


def test_mockingjay_encoder_parity():
    from s3prl.upstream.mockingjay.model import TransformerConfig, TransformerModel

    torch.manual_seed(0)
    cfg_dict = {
        "hidden_size": 64,
        "num_hidden_layers": 3,
        "num_attention_heads": 4,
        "intermediate_size": 128,
        "hidden_act": "gelu",
        "hidden_dropout_prob": 0.0,
        "attention_probs_dropout_prob": 0.0,
        "initializer_range": 0.02,
        "layer_norm_eps": 1.0e-12,
        "share_layer": False,
        "pre_layer_norm": False,
    }
    ref = TransformerModel(TransformerConfig(cfg_dict), input_dim=40)
    ref.eval()

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 37, 40).astype(np.float32)
    lens = np.array([37, 21], np.int32)
    pos = sinusoid_table(37, 64)[None].repeat(2, 0)
    attn_mask = (np.arange(37)[None] < lens[:, None]).astype(np.float32)

    with torch.no_grad():
        encoded = ref(
            torch.from_numpy(feats),
            torch.from_numpy(pos.copy()),
            torch.from_numpy(attn_mask),
            output_all_encoded_layers=True,
        )
    ref_hs = [e.numpy() for e in encoded]

    cfg = MockingjayConfig(
        input_dim=40, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    params = mockingjay_params_from_torch(ref.state_dict(), 3)
    ours = MockingjayEncoder(cfg)
    hs, h_lens = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(feats), jnp.asarray(lens), deterministic=True,
    )
    hs = np.asarray(hs)
    assert hs.shape[0] == len(ref_hs) == 4  # input repr + 3 block outputs
    for l, ref_layer in enumerate(ref_hs):
        for b, n in enumerate(lens):
            np.testing.assert_allclose(
                hs[l, b, :n], ref_layer[b, :n], atol=5e-4, err_msg=f"layer {l} b {b}"
            )
