"""Packaged model API: SUpstream + Featurizer + UpstreamDownstreamModel.

The TPU-native analog of s3prl.nn (reference: s3prl/nn/upstream.py:38-385):

- `SUpstream(name)` loads a hub entry and exposes the padded-batch forward
  `(wavs[B,T], wav_lens[B]) -> (hs[L,B,T',H], h_lens[B])` with the exact
  length rules of the reference (trim/repeat-last-frame; h_len =
  floor((wav_len-1)/stride)+1; 0.05 s minimum input).
  Unlike the reference's list-of-tensors API, hidden states come back as one
  stacked array — the natural XLA layout — with `.as_list()` for parity.
- `Featurizer` is the trainable softmax weighted-sum over layers
  (reference: nn/upstream.py:234-349), a flax module so its weights live in
  the downstream's trainable params.
- `UpstreamDownstreamModel` composes a frozen/trainable upstream with a
  featurizer + downstream head (reference: nn/upstream.py:352-385).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..upstream.base import Upstream
from ..upstream.registry import load as hub_load


class SUpstream:
    """User-facing upstream wrapper (analog of S3PRLUpstream)."""

    def __init__(
        self,
        name: str,
        path_or_url: Optional[str] = None,
        refresh: bool = False,
        normalize: bool = False,
        extra_conf: Optional[dict] = None,
        randomize: bool = False,
    ):
        conf = dict(extra_conf or {})
        if path_or_url is not None:
            conf["ckpt"] = path_or_url
        if randomize:
            conf.pop("ckpt", None)  # random init = no checkpoint
        self.upstream: Upstream = hub_load(name, **conf)
        self.normalize = normalize

    @property
    def num_layers(self) -> int:
        return self.upstream.num_layers

    @property
    def hidden_sizes(self) -> List[int]:
        return self.upstream.hidden_sizes

    @property
    def downsample_rates(self) -> List[int]:
        return self.upstream.downsample_rates

    @property
    def params(self):
        return self.upstream.params

    def __call__(self, wavs, wav_lens, train: bool = False, rngs=None):
        hs, h_lens = self.upstream(wavs, wav_lens, train=train, rngs=rngs)
        if self.normalize:
            mean = hs.mean(axis=-1, keepdims=True)
            var = hs.var(axis=-1, keepdims=True)
            hs = (hs - mean) * jax.lax.rsqrt(var + 1e-5)
        return hs, h_lens

    def as_list(self, hs: jnp.ndarray, h_lens: jnp.ndarray):
        """Reference-shaped output: (List[hs[B,T,H]], List[h_lens[B]])."""
        return [hs[i] for i in range(hs.shape[0])], [h_lens] * hs.shape[0]


class Featurizer(nn.Module):
    """Trainable softmax weighted-sum over upstream layers.

    Reference: s3prl/nn/upstream.py:234-349 — requires homogeneous hidden
    size/stride, passes through single-layer upstreams, supports a layer
    subset and optional pre-norm.
    """

    num_layers: int
    layer_selections: Optional[Tuple[int, ...]] = None
    normalize: bool = False

    @nn.compact
    def __call__(self, hs: jnp.ndarray, h_lens: jnp.ndarray):
        """hs[L, B, T, H] -> (weighted[B, T, H], h_lens)."""
        assert hs.shape[0] == self.num_layers, (hs.shape, self.num_layers)
        if self.num_layers == 1:
            return hs[0], h_lens
        if self.layer_selections is not None:
            sel = tuple(sorted(self.layer_selections))
            hs = hs[jnp.asarray(sel)]
        n = hs.shape[0]
        if self.normalize:
            mean = hs.mean(axis=-1, keepdims=True)
            var = hs.var(axis=-1, keepdims=True)
            hs = (hs - mean) * jax.lax.rsqrt(var + 1e-5)
        weights = self.param("weights", nn.initializers.zeros, (n,))
        norm_weights = jax.nn.softmax(weights)
        out = jnp.einsum("l,lbth->bth", norm_weights.astype(hs.dtype), hs)
        return out, h_lens


class UpstreamDownstreamModel(nn.Module):
    """Featurizer + downstream head over a (usually frozen) upstream.

    The upstream forward happens *outside* this module (its params are not
    trainable by default, mirroring upstream_trainable=False in
    nn/upstream.py:352-385 and the SUPERB frozen-probe protocol); this module
    owns the trainable featurizer + downstream parameters.
    """

    downstream: nn.Module
    num_layers: int
    layer_selections: Optional[Tuple[int, ...]] = None
    featurizer_normalize: bool = False

    @nn.compact
    def __call__(self, hs, h_lens, *args, train: bool = False, **kwargs):
        h, h_len = Featurizer(
            self.num_layers, self.layer_selections, self.featurizer_normalize,
            name="featurizer",
        )(hs, h_lens)
        return self.downstream(h, h_len, *args, train=train, **kwargs)
