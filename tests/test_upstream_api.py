"""SUpstream / Featurizer / hub API tests.

Checks the reference's exact length rules (s3prl/nn/upstream.py:166-231) and
the weighted-sum featurizer semantics (nn/upstream.py:234-349).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s3prl_tpu import hub
from s3prl_tpu.nn import Featurizer, SUpstream, UtteranceLevel
from s3prl_tpu.util.pseudo_data import pseudo_batch


def test_hub_options():
    names = hub.options()
    for expected in ["fbank", "mfcc", "hubert", "wav2vec2", "hubert_large_ll60k"]:
        assert expected in names


def test_fbank_upstream_length_rules():
    model = SUpstream("fbank")
    wavs, lens = pseudo_batch([2.0, 1.3])
    hs, h_lens = model(wavs, lens)
    stride = model.downsample_rates[0]
    assert stride == 160
    # expected max length: len(range(0, max_wav_len, stride))
    assert hs.shape[2] == len(range(0, wavs.shape[1], stride))
    # h_len rule: floor((wav_len-1)/stride)+1
    np.testing.assert_array_equal(np.asarray(h_lens), (lens - 1) // stride + 1)
    assert hs.shape[0] == 1 and hs.shape[-1] == 240  # fbank80 + 2 deltas


def test_min_second_padding():
    model = SUpstream("fbank")
    wavs, lens = pseudo_batch([0.02, 0.01])  # < 0.05 s
    hs, h_lens = model(wavs, lens)
    # valid lengths follow the original (pre-min-pad) wav lengths
    np.testing.assert_array_equal(np.asarray(h_lens), (lens - 1) // 160 + 1)
    # static shape covers the 0.05 s padded run (the reference would trim to
    # max(h_len); we keep the static padded frames, masked by h_lens)
    assert hs.shape[2] == len(range(0, 800, 160))


def test_featurizer_passthrough_single_layer():
    feats = jnp.asarray(np.random.RandomState(0).randn(1, 2, 5, 8).astype(np.float32))
    lens = jnp.asarray([5, 3])
    f = Featurizer(num_layers=1)
    out, out_lens = f.apply({"params": {}}, feats, lens)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(feats[0]))


def test_featurizer_weighted_sum():
    rng = np.random.RandomState(0)
    hs = jnp.asarray(rng.randn(4, 2, 5, 8).astype(np.float32))
    lens = jnp.asarray([5, 3])
    f = Featurizer(num_layers=4)
    variables = f.init(jax.random.key(0), hs, lens)
    out, _ = f.apply(variables, hs, lens)
    # zero-init weights -> uniform average
    np.testing.assert_allclose(np.asarray(out), np.asarray(hs.mean(0)), atol=1e-5)
    # layer subset
    f2 = Featurizer(num_layers=4, layer_selections=(1, 3))
    v2 = f2.init(jax.random.key(0), hs, lens)
    out2, _ = f2.apply(v2, hs, lens)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(hs[jnp.asarray([1, 3])].mean(0)), atol=1e-5)


def test_fbank_to_utterance_head_end_to_end():
    model = SUpstream("fbank")
    wavs, lens = pseudo_batch([1.0, 0.6])
    hs, h_lens = model(wavs, lens)
    head = UtteranceLevel(output_size=7)
    variables = head.init(jax.random.key(0), hs[0], h_lens)
    logits = head.apply(variables, hs[0], h_lens)
    assert logits.shape == (2, 7)


@pytest.mark.slow
def test_tiny_hubert_via_hub():
    up = hub.load("hubert")  # random init (no ckpt in test env)
    wavs, lens = pseudo_batch([0.5, 0.3])
    hs, h_lens = up(jnp.asarray(wavs), jnp.asarray(lens))
    assert hs.shape[0] == 13
    np.testing.assert_array_equal(np.asarray(h_lens), (lens - 1) // 320 + 1)
