"""BYOL-A/S AudioNTT2020 parity vs the reference network (random init)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from s3prl_tpu.models.byol import AudioNTT2020
from s3prl_tpu.upstream.convert import byol_variables_from_torch


def test_audio_ntt_parity():
    from s3prl.upstream.byol_s.byol_a.models.audio_ntt import (
        AudioNTT2020 as RefNet,
    )

    torch.manual_seed(0)
    ref = RefNet(n_mels=64, d=128)
    ref.eval()

    rng = np.random.RandomState(0)
    mel = rng.randn(3, 64, 101).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.from_numpy(mel).unsqueeze(1))

    variables = byol_variables_from_torch(ref.state_dict())
    ours = AudioNTT2020(64, 128)
    emb = ours.apply(
        {
            "params": jax.tree_util.tree_map(jnp.asarray, variables["params"]["net"]),
            "batch_stats": jax.tree_util.tree_map(
                jnp.asarray, variables["batch_stats"]["net"]
            ),
        },
        jnp.asarray(mel), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(emb), out.numpy(), atol=5e-4)


def test_byol_ckpt_roundtrip(tmp_path):
    from s3prl.upstream.byol_s.byol_a.models.audio_ntt import (
        AudioNTT2020 as RefNet,
    )

    torch.manual_seed(1)
    ref = RefNet(n_mels=64, d=2048)
    path = tmp_path / "byols.pth"
    torch.save(ref.state_dict(), path)

    from s3prl_tpu import hub

    # standardized length rule: floor((8000-1)/stride) + 1
    for name, expected_ts in (("byol_s", 10), ("byol_a", 1)):
        up = hub.load(name, ckpt=str(path))
        wav = np.random.RandomState(0).randn(1, 8000).astype(np.float32) * 0.1
        hs, lens = up(jnp.asarray(wav), jnp.asarray([8000]))
        assert hs.shape[0] == 1 and hs.shape[-1] == 2048
        assert int(np.asarray(lens)[0]) == expected_ts
        assert np.isfinite(np.asarray(hs)).all()


def test_resnetish34_parity():
    from s3prl.upstream.byol_s.byol_a.models.resnetish import resnetish34

    torch.manual_seed(2)
    ref = resnetish34()
    ref.eval()
    # perturb running stats away from init so the BN conversion is exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(2)
    mel = rng.randn(2, 64, 96).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.from_numpy(mel).unsqueeze(1))

    from s3prl_tpu.models.byol import ResNetish34
    from s3prl_tpu.upstream.convert import resnetish34_variables_from_torch

    variables = resnetish34_variables_from_torch(ref.state_dict())
    emb = ResNetish34().apply(
        {
            "params": jax.tree_util.tree_map(jnp.asarray, variables["params"]["net"]),
            "batch_stats": jax.tree_util.tree_map(
                jnp.asarray, variables["batch_stats"]["net"]
            ),
        },
        jnp.asarray(mel), deterministic=True,
    )
    assert emb.shape == tuple(out.shape) == (2, 2048)
    np.testing.assert_allclose(np.asarray(emb), out.numpy(), atol=2e-3)


def test_cvt_parity():
    from s3prl.upstream.byol_s.byol_a.models.cvt import CvT as RefCvT

    torch.manual_seed(3)
    # the published byol_s_cvt shape (serab config.yaml: depths [1,1,1],
    # embed_dims [64,256,512], pool mean+max)
    ref = RefCvT(
        s1_emb_dim=64, s1_depth=1, s1_mlp_mult=4,
        s2_emb_dim=256, s2_depth=1, s2_mlp_mult=4,
        s3_emb_dim=512, s3_depth=1, s3_mlp_mult=4,
        pool="mean+max",
    )
    ref.eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(3)
    mel = rng.randn(2, 64, 96).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.from_numpy(mel).unsqueeze(1))

    from s3prl_tpu.models.byol import CvT
    from s3prl_tpu.upstream.convert import cvt_variables_from_torch

    variables = cvt_variables_from_torch(ref.state_dict())
    emb = CvT().apply(
        {
            "params": jax.tree_util.tree_map(jnp.asarray, variables["params"]["net"]),
            "batch_stats": jax.tree_util.tree_map(
                jnp.asarray, variables["batch_stats"]["net"]
            ),
        },
        jnp.asarray(mel), deterministic=True,
    )
    assert emb.shape == tuple(out.shape) == (2, 2048)
    np.testing.assert_allclose(np.asarray(emb), out.numpy(), atol=2e-3)


def test_byol_s_encoder_hub_roundtrip(tmp_path):
    from s3prl.upstream.byol_s.byol_a.models.resnetish import resnetish34

    torch.manual_seed(4)
    ref = resnetish34()
    path = tmp_path / "resnetish34.pth"
    torch.save(ref.state_dict(), path)

    from s3prl_tpu import hub

    up = hub.load("byol_s_resnetish34", ckpt=str(path))
    assert up.hidden_size == 2048
    wav = np.random.RandomState(4).randn(1, 8000).astype(np.float32)
    hs, lens = up.apply_standardized(up.params, jnp.asarray(wav), jnp.asarray([8000]))
    assert hs.shape[-1] == 2048 and np.isfinite(np.asarray(hs)).all()
