"""PaSST parity vs the reference vendored hear21passt net (random init)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from s3prl_tpu.models.passt import PasstConfig, PasstNet, resample
from s3prl_tpu.upstream.convert import passt_params_from_torch


def test_passt_net_parity():
    from s3prl.upstream.passt.hear21passt.models.passt import PaSST

    torch.manual_seed(0)
    ref = PaSST(
        img_size=(128, 38), patch_size=16, stride=10, in_chans=1,
        num_classes=10, embed_dim=64, depth=2, num_heads=4,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
    )
    ref.eval()

    rng = np.random.RandomState(0)
    mel = rng.randn(2, 128, 30).astype(np.float32)  # t' = (30-16)//10+1 = 2
    with torch.no_grad():
        logits, feats = ref(torch.from_numpy(mel).unsqueeze(1))

    cfg = PasstConfig(
        input_fdim=128, input_tdim=38, embed_dim=64, depth=2, num_heads=4,
        n_classes=10,
    )
    params = passt_params_from_torch(ref.state_dict(), depth=2)
    ours = PasstNet(cfg)
    lo, fo = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(mel), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(fo), feats.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(lo), logits.numpy(), atol=5e-4)


def test_resample_properties():
    """Polyphase 16->32 kHz: length, DC gain, tone preservation."""
    t = np.arange(16000) / 16000.0
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    up = np.asarray(resample(jnp.asarray(tone[None]), 16000, 32000))[0]
    assert up.shape[0] == 32000
    # interior samples at even indices track the original closely
    np.testing.assert_allclose(up[200:31800:2], tone[100:15900], atol=5e-3)
    dc = np.asarray(resample(jnp.ones((1, 8000), np.float32)))[0]
    np.testing.assert_allclose(dc[100:-100], 1.0, atol=1e-3)


def test_passt_2lvlmel_embedding_shapes():
    """The 2-level+mel variants' embedding layout (hear21passt
    base2levelmel.py:58-72: concat(ts, ts@4x-window, mel@1920) -> 768 extra
    mel dims; hop variants use 5x and 6*hop mel windows)."""
    import jax

    from s3prl_tpu.models.passt import PASST_2LVL_MEL, PasstModel
    from dataclasses import replace

    cfg = replace(PASST_2LVL_MEL, depth=1, embed_dim=64, num_heads=2,
                  n_classes=11)
    assert cfg.embedding_size == (11 + 64) * 2 + 128 * 6
    model = PasstModel(cfg)
    wav = np.random.RandomState(0).randn(1, 8000).astype(np.float32) * 0.1
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.asarray(wav), jnp.asarray([8000])
    )["params"]
    hs, lens = model.apply({"params": params}, jnp.asarray(wav), jnp.asarray([8000]))
    assert hs.shape[-1] == cfg.embedding_size
    assert np.isfinite(np.asarray(hs)).all()


def test_passt_upstream_forward():
    from s3prl_tpu import hub

    cfg_small = None  # use default entry but on a short wav for speed
    up = hub.load("passt_base")
    wav = np.random.RandomState(0).randn(1, 16000).astype(np.float32) * 0.1
    hs, lens = up.apply_standardized(up.params, jnp.asarray(wav), jnp.asarray([16000]))
    assert hs.shape[0] == 1 and hs.shape[-1] == 527 + 768
    # raw model yields 21 timestamps (50 ms hop); the standardized rule
    # (floor((len-1)/stride)+1, nn/upstream.py:166-231) trims to 20
    assert int(np.asarray(lens)[0]) == 20
    assert np.isfinite(np.asarray(hs)).all()
