"""Speaker models: TDNN x-vector (SUPERB ASV) + diarization head.

Behavioral spec from the reference's s3prl/nn/speaker_model.py: TDNN:34
(context-size dilated VALID conv + ReLU + dropout + optional BN),
XVectorBackbone:128 (512-512-512-512-1500 with contexts 5,3,3,1,1 and
dilations 1,2,3,1,1 — total length reduction 14 frames), SuperbXvector:463
(projector -> TDNNs -> stats pooling -> affine; the second affine layer only
applies in training — reproduced faithfully), and the frame-level
diarization model (nn/rnn.py SuperbDiarizationModel: LSTM stack + linear).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .heads import TemporalStatisticsPooling

XVECTOR_TDNNS_LENGTH_REDUCTION = 14


class TDNN(nn.Module):
    output_size: int
    context_size: int = 5
    dilation: int = 1
    dropout_p: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.output_size,
            kernel_size=(self.context_size,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            name="conv",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_p)(x, deterministic=not train)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return x


class XVectorBackbone(nn.Module):
    output_size: int = 1500
    dropout_p: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        specs = [
            (512, 5, 1), (512, 3, 2), (512, 3, 3), (512, 1, 1),
            (self.output_size, 1, 1),
        ]
        for i, (out, ctx, dil) in enumerate(specs):
            x = TDNN(out, ctx, dil, self.dropout_p, self.batch_norm, name=f"tdnn_{i}")(
                x, train=train
            )
        return x


class SuperbXvector(nn.Module):
    """x-vector extractor: (hs_features[B,T,H], lens[B]) -> emb[B, output].

    `pooling` selects the aggregation (reference agg_module: SP = statistics
    pooling for sv_voxceleb1, SAP for voxceleb2_amsoftmax_segment_eval)."""

    output_size: int = 512
    hidden_size: int = 512
    aggregation_size: int = 1500
    dropout_p: float = 0.0
    batch_norm: bool = False
    pooling: str = "TemporalStatisticsPooling"

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_len: jnp.ndarray, train: bool = False):
        from .heads import POOLINGS

        x = nn.Dense(self.hidden_size, name="projector")(x)
        x = XVectorBackbone(
            self.aggregation_size, self.dropout_p, self.batch_norm, name="tdnns"
        )(x, train=train)
        x_len = jnp.maximum(x_len - XVECTOR_TDNNS_LENGTH_REDUCTION, 1)
        pooled = POOLINGS[self.pooling](name="pool")(x, x_len)
        h = nn.relu(nn.Dense(self.output_size, name="affine1")(pooled))
        # the reference's _UtteranceExtractor applies a second affine layer in
        # training only; create it unconditionally so the param tree is
        # mode-independent, gate its application
        affine2 = nn.Dense(self.output_size, name="affine2")
        h2 = nn.relu(affine2(h))
        return h2 if train else h


class SuperbDiarizationModel(nn.Module):
    """Frame-level multi-speaker activity head (reference: nn/rnn.py)."""

    output_size: int = 2  # num speakers
    hidden_size: int = 512
    num_layers: int = 3

    @nn.compact
    def __call__(self, xs: jnp.ndarray, xs_len: jnp.ndarray, train: bool = False):
        for i in range(self.num_layers):
            rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size), name=f"lstm_{i}")
            xs = rnn(xs, seq_lengths=xs_len)
        logits = nn.Dense(self.output_size, name="linear")(xs)
        return logits, xs_len


class SapSpeakerHead(nn.Module):
    """Projector + self-attentive pooling utterance embedder (reference:
    downstream/voxceleb2_ge2e/config.yaml modelrc — module Identity,
    input_dim 256, agg_module SAP)."""

    input_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_len: jnp.ndarray, train: bool = False):
        from .heads import SelfAttentivePooling

        x = nn.Dense(self.input_dim, name="projector")(x)
        return SelfAttentivePooling(name="sap")(x, x_len)
