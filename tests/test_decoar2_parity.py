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
