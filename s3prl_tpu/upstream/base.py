"""The upstream contract — TPU-native replacement for UpstreamBase + hooks.

The reference defines upstreams as torch modules whose per-layer hidden
states are captured by forward hooks (s3prl/upstream/interfaces.py:37-131)
and standardized by S3PRLUpstream (s3prl/nn/upstream.py:181-231). In JAX the
hook machinery is unnecessary: every model returns all layer outputs
directly. An `Upstream` bundles:

- `apply_fn(params, wavs[B,T], wav_lens[B], train, rngs) ->
  (hidden_states[L, B, T', H], feat_lens[B])` — a pure, jittable function;
- metadata: `num_layers`, `hidden_size`, `downsample_rate` (discovered by a
  probe forward on pseudo audio, like the reference's
  nn/upstream.py:124-140).

`standardize_hidden_states` applies the reference's exact length rules
(nn/upstream.py:166-231): trim/repeat-last-frame to len(range(0, max_wav_len,
stride)) and h_len = floor((wav_len-1)/stride) + 1. One static-shape
deviation: the reference trims the time axis to max(h_len) — identical to our
static ceil(max_wav_len/stride) except for sub-0.05 s batches, where we keep
the min-pad frames (beyond h_len, callers must mask) instead of a
data-dependent trim.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.masking import expected_max_feat_len, upstream_feat_lengths

MIN_SECOND = 0.05  # minimum supported audio length (nn/upstream.py:197-203)
SAMPLE_RATE = 16000


def match_length_stacked(hs: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Trim or repeat-last-frame along the time axis (axis=-2).

    Works on [..., T, H]; reference rule at nn/upstream.py:166-179.
    """
    cur = hs.shape[-2]
    if cur == target_len:
        return hs
    if cur > target_len:
        return hs[..., :target_len, :]
    # repeat the last frame; the reference asserts a <2x ratio here, but its
    # own API outliers (vggish & co, test_upstream.py:152-184 skip list) can
    # exceed it — repeat-filling covers them too
    reps = [1] * hs.ndim
    reps[-2] = target_len - cur
    pad = jnp.tile(hs[..., -1:, :], reps)
    return jnp.concatenate([hs, pad], axis=-2)


def standardize_hidden_states(
    hidden_states: jnp.ndarray,  # [L, B, T', H]
    wav_lens: jnp.ndarray,  # [B] original (pre-min-pad) lengths
    max_wav_len: int,
    stride: int,
):
    """Returns (hs[L, B, T_expected, H], h_lens[B]) under the reference rules."""
    target = expected_max_feat_len(max_wav_len, stride)
    hs = match_length_stacked(hidden_states, target)
    h_lens = upstream_feat_lengths(wav_lens, stride)
    return hs, h_lens


@dataclass
class Upstream:
    """A ready-to-run upstream: pure apply fn + params + probed metadata."""

    name: str
    apply_fn: Callable  # (params, wavs, wav_lens, train, rngs) -> (hs, feat_lens)
    params: Any
    num_layers: int
    hidden_size: int
    downsample_rate: int
    # per-layer values for the packaged API (homogeneous for most upstreams)
    hidden_sizes: List[int] = field(default_factory=list)
    downsample_rates: List[int] = field(default_factory=list)

    def __post_init__(self):
        if not self.hidden_sizes:
            self.hidden_sizes = [self.hidden_size] * self.num_layers
        if not self.downsample_rates:
            self.downsample_rates = [self.downsample_rate] * self.num_layers

    def __call__(
        self,
        wavs: jnp.ndarray,
        wav_lens: jnp.ndarray,
        train: bool = False,
        rngs: Optional[dict] = None,
    ):
        return self.apply_standardized(self.params, wavs, wav_lens, train, rngs)

    def apply_standardized(
        self,
        params,
        wavs: jnp.ndarray,
        wav_lens: jnp.ndarray,
        train: bool = False,
        rngs: Optional[dict] = None,
    ):
        """Standardized forward: returns (hs[L, B, T, H], h_lens[B]).

        Pure in `params` — jit-friendly with static `train`. Mirrors
        S3PRLUpstream.forward (nn/upstream.py:181-231) on padded batches.
        """
        wavs = jnp.asarray(wavs)
        wav_lens = jnp.asarray(wav_lens, jnp.int32)
        if wavs.ndim == 3:  # (B, T, 1)
            wavs = wavs[..., 0]
        original_max = wavs.shape[1]
        min_samples = int(MIN_SECOND * SAMPLE_RATE)
        if original_max < min_samples:  # min-length zero pad (static decision)
            # reference pads every wav_len by the same amount (upstream.py:199-207)
            wavs = jnp.pad(wavs, ((0, 0), (0, min_samples - original_max)))
            run_lens = wav_lens + (min_samples - original_max)
        else:
            run_lens = wav_lens
        hs, _ = self.apply_fn(params, wavs, run_lens, train, rngs)
        return standardize_hidden_states(hs, wav_lens, int(wavs.shape[1]), self.downsample_rate)


def probe_metadata(apply_fn, params, secs=(2.0, 1.7)) -> dict:
    """Discover num_layers / hidden_size / output frames via a probe forward
    on pseudo audio (analog of nn/upstream.py:124-140)."""
    from ..util.pseudo_data import pseudo_batch

    wavs, lens = pseudo_batch(secs)
    hs, feat_lens = apply_fn(params, jnp.asarray(wavs), jnp.asarray(lens), False, None)
    max_wav = wavs.shape[1]
    # infer stride from output frame count: closest power-of-2-ish divisor
    n_frames = int(np.asarray(feat_lens).max())
    stride = int(round(max_wav / max(n_frames, 1)))
    return dict(num_layers=int(hs.shape[0]), hidden_size=int(hs.shape[-1]), stride=stride)
