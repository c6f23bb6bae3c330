"""CPC parity vs the reference CPCModel (random init, converted weights)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

# torchaudio is stubbed centrally in conftest.py when absent

import jax
import jax.numpy as jnp

from s3prl_tpu.models.cpc import CPCConfig, CPCModel
from s3prl_tpu.upstream.convert import cpc_params_from_torch


def _build_ref(ar_mode: str, n_levels: int, seed: int = 0):
    from s3prl.upstream.cpc.model import CPCAR, CPCEncoder
    from s3prl.upstream.cpc.model import CPCModel as RefCPC

    torch.manual_seed(seed)
    enc = CPCEncoder(64, "layerNorm")
    ar = CPCAR(64, 64, False, n_levels, mode=ar_mode)
    ref = RefCPC(enc, ar)
    ref.eval()
    return ref


@pytest.mark.parametrize("ar_mode,n_levels", [("LSTM", 1), ("GRU", 2)])
def test_cpc_parity(ar_mode, n_levels):
    ref = _build_ref(ar_mode, n_levels)

    rng = np.random.RandomState(0)
    wav = rng.randn(2, 4000).astype(np.float32)
    with torch.no_grad():
        c, z, _ = ref(torch.from_numpy(wav).unsqueeze(1), None)
    ref_z = z.numpy()  # already [B, T, C] (model permutes)
    ref_c = c.numpy()

    cfg = CPCConfig(hidden_size=64, ar_size=64, ar_layers=n_levels, ar_mode=ar_mode.lower())
    params = cpc_params_from_torch(ref.state_dict(), cfg)
    ours = CPCModel(cfg)
    hs, lens = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(wav), jnp.asarray([4000, 4000]), train=False,
    )
    hs = np.asarray(hs)
    assert hs.shape[2] == ref_z.shape[1]
    np.testing.assert_allclose(hs[0], ref_z, atol=5e-4)  # encoder z
    np.testing.assert_allclose(hs[1], ref_c, atol=5e-4)  # AR context c


def test_cpc_ckpt_roundtrip(tmp_path):
    """hub.load('cpc', ckpt=...) consumes a {"config","weights"} ckpt
    (reference cpc/expert.py:27-34)."""
    ref = _build_ref("LSTM", 1, seed=3)
    path = tmp_path / "cpc.pt"
    torch.save(
        {
            "config": {"hiddenEncoder": 64, "hiddenGar": 64, "nLevelsGRU": 1, "arMode": "LSTM"},
            "weights": ref.state_dict(),
        },
        path,
    )
    from s3prl_tpu import hub

    up = hub.load("cpc", ckpt=str(path))
    wav = np.random.RandomState(0).randn(1, 4000).astype(np.float32)
    hs, _ = up.apply_standardized(up.params, jnp.asarray(wav), jnp.asarray([4000]))
    assert hs.shape[0] == 2 and hs.shape[-1] == 64
