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
import jax
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
    conv_bias: bool = True  # aggregator convs (fairseq `not no_conv_bias`)
    # vq-wav2vec quantizer between z and the aggregator (vq_type != "none")
    vq_type: str = "none"  # "none" | "gumbel" | "kmeans"
    vq_vars: int = 320
    vq_groups: int = 2
    vq_dim: int = 0  # 0 -> feature dim
    vq_depth: int = 1
    combine_groups: bool = False

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


class GumbelQuantizer(nn.Module):
    """Gumbel-softmax vector quantizer (reference: wav2vec2_model.py
    GumbelVectorQuantizer:1591, time-first variant). Eval = hard argmax
    codeword lookup; train = straight-through hard gumbel-softmax."""

    num_vars: int
    groups: int
    vq_dim: int
    combine_groups: bool = False
    depth: int = 1
    temp: float = 2.0
    activation: str = "relu"  # wav2vec cfg.activation default (model.py:580)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x[B, T, C] -> (quantized[B, T, vq_dim], idx[B, T, groups])."""
        B, T, C = x.shape
        G, V = self.groups, self.num_vars
        num_groups = 1 if self.combine_groups else G
        var_dim = self.vq_dim // G
        vars_ = self.param(
            "vars", nn.initializers.uniform(scale=1.0), (1, num_groups * V, var_dim)
        )
        h = x
        if self.depth > 1:  # Sequential blocks of (Linear, GELU), then Linear
            inner = C * 2  # weight_proj_factor=2 (wav2vec_model.py:611)
            act = nn.relu if self.activation == "relu" else (
                lambda v: nn.gelu(v, approximate=False)
            )
            for i in range(self.depth - 1):
                h = act(nn.Dense(inner, name=f"weight_proj_{i}")(h))
        logits = nn.Dense(G * V, name="weight_proj")(h).reshape(B, T, G, V)
        if train:
            # F.gumbel_softmax(logits, tau, hard=True) semantics
            # (wav2vec_model.py GumbelVectorQuantizer): ONE shared gumbel
            # draw — hard sample = argmax(logits + g) (temperature-free),
            # gradient through softmax((logits + g) / tau)
            g = jax.random.gumbel(self.make_rng("gumbel"), logits.shape,
                                  dtype=logits.dtype)
            noisy = logits + g
            probs = jax.nn.softmax(noisy / self.temp, axis=-1)
            onehot = jax.nn.one_hot(jnp.argmax(noisy, axis=-1), V, dtype=x.dtype)
            onehot = probs + jax.lax.stop_gradient(onehot - probs)  # STE
        else:
            onehot = jax.nn.one_hot(jnp.argmax(logits, axis=-1), V, dtype=x.dtype)
        idx = jnp.argmax(onehot, axis=-1)  # [B, T, G]
        codebook = vars_[0].reshape(num_groups, V, var_dim)
        if self.combine_groups:
            codebook = jnp.broadcast_to(codebook, (G, V, var_dim))
        q = jnp.einsum("btgv,gvd->btgd", onehot, codebook.astype(onehot.dtype))
        return q.reshape(B, T, G * var_dim), idx


class KmeansQuantizer(nn.Module):
    """K-means (straight-through) quantizer (reference: wav2vec_model.py
    KmeansVectorQuantizer:117)."""

    num_vars: int
    groups: int
    vq_dim: int
    combine_groups: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        B, T, C = x.shape
        G, V = self.groups, self.num_vars
        num_groups = 1 if self.combine_groups else G
        var_dim = self.vq_dim // G
        embedding = self.param(
            "embedding", nn.initializers.normal(0.01), (V, num_groups, var_dim)
        )
        # grouped 1x1 conv projection + Fp32GroupNorm(groups, dim)
        ze = nn.Conv(
            C, (1,), feature_group_count=G, use_bias=False, name="projection"
        )(x)
        ze = nn.GroupNorm(num_groups=G, epsilon=1e-5, dtype=jnp.float32, name="proj_gn")(
            ze
        ).astype(x.dtype)
        ze_g = ze.reshape(B, T, G, var_dim)
        emb = embedding.transpose(1, 0, 2)  # [num_groups, V, D]
        if num_groups != G:
            emb = jnp.broadcast_to(emb, (G, V, var_dim))
        d = jnp.linalg.norm(
            ze_g[:, :, :, None, :] - emb[None, None], axis=-1
        )  # [B, T, G, V]
        idx = jnp.argmin(d, axis=-1)  # [B, T, G]
        zq = jnp.take_along_axis(
            jnp.broadcast_to(emb[None, None], (B, T, G, V, var_dim)),
            idx[..., None, None],
            axis=3,
        )[:, :, :, 0].reshape(B, T, G * var_dim)
        q = ze + jax.lax.stop_gradient(zq.astype(ze.dtype) - ze)  # STE
        return q, idx


class Wav2Vec1Model(nn.Module):
    cfg: Wav2Vec1Config = Wav2Vec1Config()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wavs: jnp.ndarray, wav_lens: jnp.ndarray, deterministic: bool = True,
                 return_code_ids: bool = False):
        """Returns (hidden_states[1 + (A-1) + 1, B, T', C], feat_lens)
        (+ code_ids[B, T', G] when return_code_ids and a quantizer exists)."""
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

        code_ids = None
        if cfg.vq_type != "none":
            vq_dim = cfg.vq_dim if cfg.vq_dim > 0 else z.shape[-1]
            quantizer_cls = GumbelQuantizer if cfg.vq_type == "gumbel" else KmeansQuantizer
            kw = {"depth": cfg.vq_depth} if cfg.vq_type == "gumbel" else {}
            x, code_ids = quantizer_cls(
                num_vars=cfg.vq_vars, groups=cfg.vq_groups, vq_dim=vq_dim,
                combine_groups=cfg.combine_groups, name="vq", **kw,
            )(z, train=not deterministic)

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
            x = nn.Conv(dim, (k,), strides=(s,), padding="VALID", use_bias=cfg.conv_bias,
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
        if return_code_ids:
            return jnp.stack(hidden_states), lens, code_ids
        return jnp.stack(hidden_states), lens
