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

from s3prl_tpu.models.mos import MosModel
from s3prl_tpu.upstream.convert import load_mos_checkpoint


def _make_ckpt(tmp_path, clipping=False, attention_pooling=False, seed=0):
    from s3prl.upstream.mos_prediction.model import MosDownstream
    from s3prl.upstream.wav2vec2.wav2vec2_model import Wav2Vec2Config as RefW2V2Config, Wav2Vec2Model as RefW2V2Model

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


def _downstream_pieces(upstream_dim, seed):
    from s3prl.upstream.mos_prediction.model import MosDownstream

    torch.manual_seed(seed)
    down = MosDownstream(upstream_dim=upstream_dim, projector_dim=32,
                         clipping=False, attention_pooling=False)
    down.eval()
    return down


def test_mos_apc_roundtrip(tmp_path):
    """mos_apc ckpt ({"Upstream": APC expert sd, ...}) loads and scores."""
    from s3prl.upstream.apc.apc import APC

    apc = APC(80, num_layers=2, hidden_size=48, dropout=0.0, residual=True)
    down = _downstream_pieces(48, seed=2)
    path = tmp_path / "mos_apc.ckpt"
    torch.save(
        {
            "Upstream": {f"model.{k}": v for k, v in apc.state_dict().items()},
            "Featurizer": {"weights": torch.randn(2)},
            "Downstream": down.state_dict(),
            "Config": {},
        },
        path,
    )
    from s3prl_tpu import hub

    up = hub.load("mos_apc", ckpt=str(path))
    wav = np.random.RandomState(2).randn(1, 18000).astype(np.float32)
    hs, lens = up.apply_standardized(up.params, jnp.asarray(wav), jnp.asarray([18000]))
    assert hs.shape[-1] == 1 and np.isfinite(np.asarray(hs)).all()
    assert np.allclose(np.asarray(hs)[0, 0, :, 0], np.asarray(hs)[0, 0, 0, 0])


def test_mos_tera_roundtrip(tmp_path):
    """mos_tera ckpt (transformer.-prefixed TransformerModel sd) loads."""
    from s3prl.upstream.mockingjay.model import TransformerConfig, TransformerModel

    conf = {
        "hidden_size": 96, "num_hidden_layers": 2, "num_attention_heads": 12,
        "intermediate_size": 128, "hidden_act": "gelu",
        "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
        "initializer_range": 0.02, "layer_norm_eps": 1e-12,
        "share_layer": False, "pre_layer_norm": False,
    }
    tera = TransformerModel(TransformerConfig(conf), input_dim=80)
    tera.eval()
    down = _downstream_pieces(96, seed=3)
    path = tmp_path / "mos_tera.ckpt"
    torch.save(
        {
            "Upstream": {f"transformer.{k}": v for k, v in tera.state_dict().items()},
            "Featurizer": {"weights": torch.randn(3)},
            "Downstream": down.state_dict(),
            "Config": {},
        },
        path,
    )
    from s3prl_tpu import hub
    from s3prl_tpu.upstream.convert import load_mos_checkpoint

    cfg, _ = load_mos_checkpoint(str(path))
    assert cfg.upstream == "tera" and cfg.tera.num_hidden_layers == 2
    assert cfg.feat_kind == "mel"

    up = hub.load("mos_tera", ckpt=str(path))
    wav = np.random.RandomState(3).randn(1, 16000).astype(np.float32)
    hs, lens = up.apply_standardized(up.params, jnp.asarray(wav), jnp.asarray([16000]))
    assert hs.shape[-1] == 1 and np.isfinite(np.asarray(hs)).all()


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


def test_mos_parity_multisegment(tmp_path):
    """Wavs longer than one 16000-sample segment follow the reference's
    unfold (len//8000 segments, last half zero-padded) — regression for the
    segment-count bug that dropped the final segment."""
    w2v2, down, weights, path = _make_ckpt(tmp_path, False, False)

    rng = np.random.RandomState(4)
    wav = rng.randn(1, 24000).astype(np.float32)
    # reference: 3 segments at starts 0/8000/16000 of the zero-padded wav
    padded = np.concatenate([wav, np.zeros((1, 8000), np.float32)], axis=1)
    segs = np.stack([padded[0, s : s + 16000] for s in (0, 8000, 16000)])
    ref = _ref_score(w2v2, down, weights, segs).mean()

    from s3prl_tpu.models.mos import MosModel
    from s3prl_tpu.upstream.convert import load_mos_checkpoint

    cfg, params = load_mos_checkpoint(str(path))
    model = MosModel(cfg)
    out, _ = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(wav), jnp.asarray([24000]), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], ref, atol=2e-3)
