"""NPC parity vs the reference masked-conv implementation (random init)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from s3prl_tpu.models.npc import NPCConfig, NPCModel
from s3prl_tpu.upstream.convert import npc_variables_from_torch


def test_npc_parity():
    from s3prl.upstream.npc.npc import NPC

    torch.manual_seed(0)
    ref = NPC(
        input_size=24, hidden_size=16, n_blocks=2, dropout=0.0, residual=True,
        kernel_size=9, mask_size=3, batch_norm=True, activate="relu",
    )
    ref.eval()

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 20, 24).astype(np.float32)
    with torch.no_grad():
        pred, feat = ref(torch.from_numpy(feats), testing=True)  # input B,T,C
    pred_np = pred.numpy()  # [B, T, input]
    feat_np = feat.numpy()  # [B, T, H]

    cfg = NPCConfig(
        input_size=24, hidden_size=16, n_blocks=2, dropout=0.0, residual=True,
        kernel_size=9, mask_size=3, batch_norm=True, activate="relu",
    )
    variables = npc_variables_from_torch(ref.state_dict(), cfg)
    ours = NPCModel(cfg)
    hs, our_pred, _ = ours.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(feats), jnp.asarray([20, 20]), train=False,
    )
    np.testing.assert_allclose(np.asarray(hs)[-1], feat_np, atol=5e-5)
    np.testing.assert_allclose(np.asarray(our_pred), pred_np, atol=5e-5)
