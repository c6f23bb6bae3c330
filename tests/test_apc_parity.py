"""APC parity vs the reference GRU implementation (random init)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from s3prl_tpu.models.apc import APCConfig, APCModel
from s3prl_tpu.upstream.convert import apc_params_from_torch


def test_apc_parity():
    from s3prl.upstream.apc.apc import APC

    torch.manual_seed(0)
    ref = APC(input_size=40, hidden_size=32, num_layers=3, dropout=0.0, residual=True)
    ref.eval()

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 25, 40).astype(np.float32)
    lens = np.array([25, 18])
    with torch.no_grad():
        predicted, feature = ref(
            torch.from_numpy(feats), torch.tensor(lens), testing=True
        )
    ref_last = feature.numpy()  # the reference returns only the LAST layer

    cfg = APCConfig(input_size=40, hidden_size=32, num_layers=3, dropout=0.0, residual=True)
    params = apc_params_from_torch(ref.state_dict(), 3)
    ours = APCModel(cfg)
    hs, pred, _ = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(feats), jnp.asarray(lens), train=False,
    )
    hs = np.asarray(hs)
    for b, n in enumerate(lens):
        np.testing.assert_allclose(
            hs[-1, b, :n], ref_last[b, :n], atol=5e-5, err_msg=f"last layer b {b}"
        )
    np.testing.assert_allclose(
        np.asarray(pred)[0, :25], predicted.numpy()[0, :25], atol=5e-5
    )
