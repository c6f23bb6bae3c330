"""wav2vec 1.0 / vq-wav2vec — fully convolutional CPC-style models.

Behavioral spec from the reference (s3prl/upstream/wav2vec/wav2vec_model.py:
ConvFeatureExtractionModel:235 (8 convs, total stride 160, GroupNorm(1,C),
ReLU, optional log compression), ConvAggegator:59 (12 causal convs k=2..13,
left pad, skip connections at sqrt(residual_scale)), KmeansVectorQuantizer /
GumbelVectorQuantizer for vq-wav2vec:117). Hidden states follow the expert's
hooks (wav2vec/expert.py:20-34): [features z, aggregator layer inputs 1..,
aggregator output].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.masking import lengths_after_conv1d

W2V1_FEATURE_LAYERS = (
    (512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2),
    (512, 4, 2), (512, 1, 1), (512, 1, 1), (512, 1, 1),
)
W2V1_AGG_LAYERS = tuple((512, k, 1) for k in range(2, 14))


@dataclass(frozen=True)
class Wav2Vec1Config:
    conv_feature_layers: Tuple = W2V1_FEATURE_LAYERS
    conv_aggregator_layers: Tuple = W2V1_AGG_LAYERS
    log_compression: bool = True
    skip_connections_feat: bool = False
    skip_connections_agg: bool = True
    residual_scale: float = 0.5
    non_affine_group_norm: bool = False
    agg_zero_pad: bool = False
    dropout: float = 0.0

    @property
    def downsample_rate(self) -> int:
        out = 1
        for _, _, s in self.conv_feature_layers:
            out *= s
        return out


def _group_norm1(name, affine=True):
    # Fp32GroupNorm(1, C): normalize jointly over (T, C) per sample
    return nn.GroupNorm(num_groups=1, epsilon=1e-5, use_bias=affine, use_scale=affine,
                        dtype=jnp.float32, name=name)


class Wav2Vec1Model(nn.Module):
    cfg: Wav2Vec1Config = Wav2Vec1Config()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wavs: jnp.ndarray, wav_lens: jnp.ndarray, deterministic: bool = True):
        """Returns (hidden_states[1 + (A-1) + 1, B, T', C], feat_lens)."""
        cfg = self.cfg
        x = wavs[..., None].astype(self.dtype)
        lens = wav_lens
        for i, (dim, k, s) in enumerate(cfg.conv_feature_layers):
            residual = x
            x = nn.Conv(dim, (k,), strides=(s,), padding="VALID", use_bias=False,
                        dtype=self.dtype, name=f"feat_conv_{i}")(x)
            x = _group_norm1(f"feat_gn_{i}", not cfg.non_affine_group_norm)(x).astype(self.dtype)
            x = nn.relu(x)
            if cfg.skip_connections_feat and residual.shape[-1] == x.shape[-1]:
                stride = residual.shape[1] // x.shape[1]
                residual = residual[:, ::stride][:, : x.shape[1]]
                x = (x + residual) * (cfg.residual_scale ** 0.5)
            lens = lengths_after_conv1d(lens, k, s)
        if cfg.log_compression:
            x = jnp.log(jnp.abs(x) + 1.0)
        z = x  # feature extractor output

        hidden_states = [z]
        scale = cfg.residual_scale ** 0.5
        for i, (dim, k, s) in enumerate(cfg.conv_aggregator_layers):
            if i > 0:
                hidden_states.append(x)  # aggregator layer inputs 1..A-1
            residual = x
            # causal left pad (replication by default, zeros if agg_zero_pad)
            ka = k // 2
            kb = ka - 1 if k % 2 == 0 else ka
            mode = "constant" if cfg.agg_zero_pad else "edge"
            xp = jnp.pad(x, ((0, 0), (ka + kb, 0), (0, 0)), mode=mode)
            x = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        dtype=self.dtype, name=f"agg_conv_{i}")(xp)
            x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
            x = _group_norm1(f"agg_gn_{i}", not cfg.non_affine_group_norm)(x).astype(self.dtype)
            x = nn.relu(x)
            if cfg.skip_connections_agg:
                if residual.shape[-1] != dim:
                    residual = nn.Conv(dim, (1,), use_bias=False, dtype=self.dtype,
                                       name=f"agg_rproj_{i}")(residual)
                x = (x + residual) * scale
        hidden_states.append(x)  # aggregator output c
        return jnp.stack(hidden_states), lens
