"""MOS predictor parity vs the reference pipeline pieces (random init).

The reference expert itself imports torchaudio (absent here), so the test
reproduces its forward exactly from the published pieces: wav2vec2 hidden
states (hook layout) -> Featurizer softmax weighted sum -> MosDownstream
(mos_prediction/model.py), on a 1-segment (16000-sample) wav.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from s3prl_tpu.models.mos import MosConfig, MosModel
from s3prl_tpu.upstream.convert import load_mos_checkpoint


def _make_ckpt(tmp_path, clipping=False, attention_pooling=False, seed=0):
    from s3prl.upstream.mos_prediction.model import MosDownstream
    from s3prl.upstream.wav2vec2.wav2vec2_model import (
        AudioPretrainingConfig,
        Wav2Vec2Config as RefW2V2Config,
        Wav2Vec2Model as RefW2V2Model,
    )

    torch.manual_seed(seed)
    w2v2 = RefW2V2Model(
        RefW2V2Config(
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            dropout_input=0.0, dropout_features=0.0, encoder_layerdrop=0.0,
        )
    )
    w2v2.eval()
    down = MosDownstream(
        upstream_dim=768, projector_dim=64,
        clipping=clipping, attention_pooling=attention_pooling,
    )
    down.eval()
    weights = torch.randn(13)

    path = tmp_path / "mos.ckpt"
    torch.save(
        {
            "Upstream": {f"model.{k}": v for k, v in w2v2.state_dict().items()},
            "Featurizer": {"weights": weights},
            "Downstream": down.state_dict(),
            "Config": {
                "downstream_expert": {
                    "modelrc": {
                        "projector_dim": 64,
                        "clipping": clipping,
                        "attention_pooling": attention_pooling,
                    }
                }
            },
        },
        path,
    )
    return w2v2, down, weights, path


def _ref_score(w2v2, down, weights, wav):
    captured = []
    hooks = [
        layer.register_forward_pre_hook(
            lambda mod, inp: captured.append(inp[0].transpose(0, 1).detach())
        )
        for layer in w2v2.encoder.layers
    ]
    with torch.no_grad():
        res = w2v2.extract_features(torch.from_numpy(wav), padding_mask=None, mask=False)
    captured.append(res["x"].detach())
    for h in hooks:
        h.remove()
    # expert postprocess trims all states to the min length (the encoder
    # pads to a seq-len multiple of 2 internally)
    t_min = min(h.size(1) for h in captured)
    states = torch.stack([h[:, :t_min] for h in captured])  # [13, B, T, C]
    feat = (torch.softmax(weights, -1)[:, None, None, None] * states).sum(0)
    with torch.no_grad():
        score = down(feat)
    return score.numpy()


@pytest.mark.parametrize("clipping,pooling", [(False, False), (True, True)])
def test_mos_parity(tmp_path, clipping, pooling):
    w2v2, down, weights, path = _make_ckpt(tmp_path, clipping, pooling)

    rng = np.random.RandomState(0)
    wav = rng.randn(2, 16000).astype(np.float32)
    ref = _ref_score(w2v2, down, weights, wav)

    cfg, params = load_mos_checkpoint(str(path))
    assert cfg.clipping == clipping and cfg.attention_pooling == pooling
    model = MosModel(cfg)
    out, lens = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(wav), jnp.asarray([16000, 16000]), deterministic=True,
    )
    ours = np.asarray(out)[0, :, 0, 0]
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_mos_hub_roundtrip(tmp_path):
    _, _, _, path = _make_ckpt(tmp_path, seed=1)
    from s3prl_tpu import hub

    up = hub.load("mos_wav2vec2", ckpt=str(path))
    wav = np.random.RandomState(1).randn(1, 20000).astype(np.float32)
    hs, lens = up.apply_standardized(up.params, jnp.asarray(wav), jnp.asarray([20000]))
    assert hs.shape[0] == 1 and hs.shape[-1] == 1
    assert np.isfinite(np.asarray(hs)).all()
    # the score is constant over time
    assert np.allclose(np.asarray(hs)[0, 0, :, 0], np.asarray(hs)[0, 0, 0, 0])
