"""DeCoAR 1 parity vs the reference bidirectional LSTM stacks (random init)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from s3prl_tpu.models.decoar import DecoarModel
from s3prl_tpu.upstream.convert import decoar_params_from_torch


def _run_ours(per_layer, params, feats, lens):
    ours = DecoarModel(per_layer=per_layer)
    hs, _ = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(feats), jnp.asarray(lens), train=False,
    )
    return np.asarray(hs)


def test_decoar_parity():
    from s3prl.upstream.decoar.decoar import Decoar

    torch.manual_seed(0)
    ref = Decoar()
    ref.eval()

    rng = np.random.RandomState(0)
    B, T = 2, 24
    feats = rng.randn(B, T, 80).astype(np.float32)
    lens = np.array([24, 17], np.int32)
    pad_mask = ~(torch.arange(T)[None] < torch.tensor(lens)[:, None])
    with torch.no_grad():
        # flipBatch mutates its input; pass a copy
        out = ref(torch.from_numpy(feats.copy()), pad_mask)
    ref_out = out.numpy()

    params = decoar_params_from_torch(ref.state_dict())
    hs = _run_ours(False, params, feats, lens)
    for b, n in enumerate(lens):
        np.testing.assert_allclose(hs[0, b, :n], ref_out[b, :n], atol=5e-4)


def test_decoar_layers_parity():
    from s3prl.upstream.decoar_layers.decoar import Decoar

    torch.manual_seed(1)
    ref = Decoar()
    ref.eval()

    rng = np.random.RandomState(1)
    B, T = 2, 20
    feats = rng.randn(B, T, 80).astype(np.float32)
    lens = np.array([20, 13], np.int32)
    pad_mask = ~(torch.arange(T)[None] < torch.tensor(lens)[:, None])
    with torch.no_grad():
        outs = ref(torch.from_numpy(feats.copy()), pad_mask)
    assert len(outs) == 4

    params = decoar_params_from_torch(ref.state_dict())
    hs = _run_ours(True, params, feats, lens)
    for l, ref_layer in enumerate(outs):
        for b, n in enumerate(lens):
            np.testing.assert_allclose(
                hs[l, b, :n], ref_layer.numpy()[b, :n], atol=5e-4,
                err_msg=f"layer {l} b {b}",
            )


def test_decoar_ckpt_roundtrip(tmp_path):
    """hub.load('decoar', ckpt=...) consumes a {"model"} ckpt
    (decoar/expert.py:31-36)."""
    from s3prl.upstream.decoar.decoar import Decoar

    torch.manual_seed(2)
    ref = Decoar()
    path = tmp_path / "decoar.pt"
    torch.save({"model": ref.state_dict()}, path)

    from s3prl_tpu import hub

    up = hub.load("decoar", ckpt=str(path))
    wav = np.random.RandomState(0).randn(1, 4000).astype(np.float32)
    hs, _ = up.apply_standardized(up.params, jnp.asarray(wav), jnp.asarray([4000]))
    assert hs.shape[0] == 1 and hs.shape[-1] == 2048
