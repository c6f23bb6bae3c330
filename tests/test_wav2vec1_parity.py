"""wav2vec 1.0 parity vs the reference conv extractor + aggregator."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from s3prl_tpu.models.wav2vec1 import Wav2Vec1Config, Wav2Vec1Model
from s3prl_tpu.upstream.convert import wav2vec1_params_from_torch


def test_wav2vec1_parity():
    from s3prl.upstream.wav2vec.wav2vec_model import Wav2VecConfig, Wav2VecModel

    torch.manual_seed(0)
    feat = "[(32, 10, 5), (32, 8, 4), (32, 4, 2)]"
    agg = "[(32, 2, 1), (32, 3, 1), (32, 4, 1)]"
    ref_cfg = Wav2VecConfig(
        infonce=False,
        conv_feature_layers=feat,
        conv_aggregator_layers=agg,
        dropout=0.0, dropout_features=0.0, dropout_agg=0.0,
        skip_connections_feat=False, skip_connections_agg=True,
        residual_scale=0.5, log_compression=True,
        no_conv_bias=False, agg_zero_pad=False,
    )
    ref = Wav2VecModel(ref_cfg)
    ref.eval()

    rng = np.random.RandomState(0)
    wav = rng.randn(2, 4000).astype(np.float32)
    with torch.no_grad():
        z = ref.feature_extractor(torch.from_numpy(wav))
        c = ref.feature_aggregator(z)
    ref_z = z.transpose(1, 2).numpy()
    ref_c = c.transpose(1, 2).numpy()

    cfg = Wav2Vec1Config(
        conv_feature_layers=((32, 10, 5), (32, 8, 4), (32, 4, 2)),
        conv_aggregator_layers=((32, 2, 1), (32, 3, 1), (32, 4, 1)),
        log_compression=True, skip_connections_feat=False,
        skip_connections_agg=True, residual_scale=0.5, dropout=0.0,
    )
    params = wav2vec1_params_from_torch(ref.state_dict(), cfg)
    ours = Wav2Vec1Model(cfg)
    hs, lens = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(wav), jnp.asarray([4000, 4000]), deterministic=True,
    )
    hs = np.asarray(hs)
    np.testing.assert_allclose(hs[0], ref_z, atol=5e-5)   # features z
    np.testing.assert_allclose(hs[-1], ref_c, atol=5e-4)  # aggregator output


@pytest.mark.parametrize("vq_type", ["gumbel", "kmeans"])
def test_vq_wav2vec_parity(vq_type):
    """vq-wav2vec: quantized codewords + aggregator output vs the reference
    (expert forward: wav2vec/expert.py:49-57)."""
    from s3prl.upstream.wav2vec.wav2vec_model import Wav2VecConfig, Wav2VecModel

    torch.manual_seed(0)
    feat = "[(32, 10, 5), (32, 8, 4), (32, 4, 2)]"
    agg = "[(32, 2, 1), (32, 3, 1), (32, 4, 1)]"
    ref_cfg = Wav2VecConfig(
        infonce=False,
        conv_feature_layers=feat,
        conv_aggregator_layers=agg,
        dropout=0.0, dropout_features=0.0, dropout_agg=0.0,
        skip_connections_feat=False, skip_connections_agg=True,
        residual_scale=0.5, log_compression=True,
        no_conv_bias=False, agg_zero_pad=False,
        vq_type=vq_type, vq_vars=16, vq_groups=2, vq_dim=32, vq_depth=2,
        vq_temp=(2.0, 0.5, 0.999995),
    )
    ref = Wav2VecModel(ref_cfg)
    ref.eval()

    rng = np.random.RandomState(0)
    wav = rng.randn(2, 4000).astype(np.float32)
    with torch.no_grad():
        z = ref.feature_extractor(torch.from_numpy(wav))
        q_res = ref.vector_quantizer(z, produce_targets=True)
        c = ref.feature_aggregator(q_res["x"])
    ref_codewords = q_res["x"].transpose(1, 2).numpy()
    ref_ids = q_res["targets"].numpy()
    ref_c = c.transpose(1, 2).numpy()

    cfg = Wav2Vec1Config(
        conv_feature_layers=((32, 10, 5), (32, 8, 4), (32, 4, 2)),
        conv_aggregator_layers=((32, 2, 1), (32, 3, 1), (32, 4, 1)),
        log_compression=True, skip_connections_feat=False,
        skip_connections_agg=True, residual_scale=0.5, dropout=0.0,
        vq_type=vq_type, vq_vars=16, vq_groups=2, vq_dim=32, vq_depth=2,
    )
    params = wav2vec1_params_from_torch(ref.state_dict(), cfg)
    ours = Wav2Vec1Model(cfg)

    # check the quantizer in isolation (codewords + code ids)
    from s3prl_tpu.models.wav2vec1 import GumbelQuantizer, KmeansQuantizer

    quant_cls = GumbelQuantizer if vq_type == "gumbel" else KmeansQuantizer
    kw = {"depth": 2} if vq_type == "gumbel" else {}
    quant = quant_cls(num_vars=16, groups=2, vq_dim=32, **kw)
    q, ids = quant.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params["vq"])},
        jnp.asarray(z.transpose(1, 2).numpy()), train=False,
    )
    np.testing.assert_allclose(np.asarray(q), ref_codewords, atol=5e-5)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)

    # end-to-end through the model
    hs, _ = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(wav), jnp.asarray([4000, 4000]), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(hs)[-1], ref_c, atol=5e-4)


def test_wav2vec1_ckpt_roundtrip(tmp_path):
    """hub.load('wav2vec', ckpt=...) consumes an s3prl-converted ckpt
    ({"task_cfg","model_cfg","model_weight"}, wav2vec/convert.py:12-21)."""
    from s3prl.upstream.wav2vec.wav2vec_model import Wav2VecConfig, Wav2VecModel

    torch.manual_seed(1)
    ref_cfg = Wav2VecConfig(
        infonce=False,
        conv_feature_layers="[(32, 10, 5), (32, 8, 4), (32, 4, 2)]",
        conv_aggregator_layers="[(32, 2, 1), (32, 3, 1)]",
        dropout=0.0, dropout_features=0.0, dropout_agg=0.0,
        log_compression=True,
    )
    ref = Wav2VecModel(ref_cfg)
    path = tmp_path / "w2v1.pt"
    torch.save(
        {
            "task_cfg": {},
            "model_cfg": {
                "conv_feature_layers": ref_cfg.conv_feature_layers,
                "conv_aggregator_layers": ref_cfg.conv_aggregator_layers,
                "log_compression": True,
            },
            "model_weight": ref.state_dict(),
        },
        path,
    )
    from s3prl_tpu import hub

    up = hub.load("wav2vec", ckpt=str(path))
    wav = np.random.RandomState(0).randn(1, 4000).astype(np.float32)
    hs, lens = up.apply_standardized(up.params, jnp.asarray(wav), jnp.asarray([4000]))
    assert hs.shape[0] == up.num_layers and hs.shape[-1] == 32
