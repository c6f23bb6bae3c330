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
