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
