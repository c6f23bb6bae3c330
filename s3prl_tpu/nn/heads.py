"""Downstream probe heads (SUPERB protocol NN blocks).

TPU-native analogs of the reference's s3prl/nn blocks: FrameLevel /
UtteranceLevel (nn/common.py), FrameLevelLinear / MeanPoolingLinear
(nn/linear.py), poolings (nn/pooling.py), RNNEncoder (nn/rnn.py). All
operate on padded `[B, T, H]` features with `[B]` valid lengths and are
careful to mask padded frames out of every reduction.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masking import length_mask


# ---------------------------------------------------------------------------
# poolings (reference: s3prl/nn/pooling.py)
# ---------------------------------------------------------------------------


class MeanPooling(nn.Module):
    """Masked mean over time: [B, T, H] -> [B, H]."""

    @nn.compact
    def __call__(self, xs: jnp.ndarray, xs_len: jnp.ndarray) -> jnp.ndarray:
        mask = length_mask(xs_len, xs.shape[1], xs.dtype)[..., None]
        denom = jnp.maximum(xs_len.astype(xs.dtype), 1.0)[:, None]
        return jnp.sum(xs * mask, axis=1) / denom


TemporalAveragePooling = MeanPooling


class TemporalStatisticsPooling(nn.Module):
    """Masked mean ++ std over time (x-vector stats pooling): [B,T,H]->[B,2H]."""

    @nn.compact
    def __call__(self, xs: jnp.ndarray, xs_len: jnp.ndarray) -> jnp.ndarray:
        mask = length_mask(xs_len, xs.shape[1], xs.dtype)[..., None]
        denom = jnp.maximum(xs_len.astype(xs.dtype), 1.0)[:, None]
        mean = jnp.sum(xs * mask, axis=1) / denom
        var = jnp.sum(jnp.where(mask > 0, (xs - mean[:, None]) ** 2, 0.0), axis=1) / denom
        return jnp.concatenate([mean, jnp.sqrt(var + 1e-10)], axis=-1)


class SelfAttentivePooling(nn.Module):
    """Learned softmax attention over time: [B, T, H] -> [B, H]."""

    @nn.compact
    def __call__(self, xs: jnp.ndarray, xs_len: jnp.ndarray) -> jnp.ndarray:
        scores = nn.Dense(1, name="attn")(nn.tanh(nn.Dense(xs.shape[-1], name="proj")(xs)))
        scores = scores[..., 0]  # [B, T]
        valid = length_mask(xs_len, xs.shape[1])
        scores = jnp.where(valid, scores, -1e9)
        w = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bt,bth->bh", w, xs)


class AttentiveStatisticsPooling(nn.Module):
    """Attention-weighted mean ++ std: [B, T, H] -> [B, 2H]."""

    @nn.compact
    def __call__(self, xs: jnp.ndarray, xs_len: jnp.ndarray) -> jnp.ndarray:
        scores = nn.Dense(1, name="attn")(nn.tanh(nn.Dense(xs.shape[-1], name="proj")(xs)))[..., 0]
        valid = length_mask(xs_len, xs.shape[1])
        w = jax.nn.softmax(jnp.where(valid, scores, -1e9), axis=-1)
        mean = jnp.einsum("bt,bth->bh", w, xs)
        var = jnp.einsum("bt,bth->bh", w, (xs - mean[:, None]) ** 2)
        return jnp.concatenate([mean, jnp.sqrt(var + 1e-10)], axis=-1)


POOLINGS = {
    "MeanPooling": MeanPooling,
    "TemporalAveragePooling": TemporalAveragePooling,
    "TemporalStatisticsPooling": TemporalStatisticsPooling,
    "SelfAttentivePooling": SelfAttentivePooling,
    "AttentiveStatisticsPooling": AttentiveStatisticsPooling,
}


# ---------------------------------------------------------------------------
# frame / utterance heads (reference: s3prl/nn/common.py, linear.py)
# ---------------------------------------------------------------------------


class FrameLevel(nn.Module):
    """Per-frame MLP probe: hidden ReLU stack + final linear."""

    output_size: int
    hidden_sizes: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, xs, xs_len, train: bool = False):
        for i, h in enumerate(self.hidden_sizes):
            xs = nn.relu(nn.Dense(h, name=f"hidden_{i}")(xs))
        return nn.Dense(self.output_size, name="final")(xs), xs_len


class UtteranceLevel(nn.Module):
    """MLP -> masked pooling -> linear (reference: nn/common.py UtteranceLevel)."""

    output_size: int
    hidden_sizes: Tuple[int, ...] = (256,)
    pooling: str = "MeanPooling"

    @nn.compact
    def __call__(self, xs, xs_len, train: bool = False):
        for i, h in enumerate(self.hidden_sizes):
            xs = nn.relu(nn.Dense(h, name=f"hidden_{i}")(xs))
        pooled = POOLINGS[self.pooling](name="pool")(xs, xs_len)
        return nn.Dense(self.output_size, name="final")(pooled)


class FrameLevelLinear(nn.Module):
    output_size: int

    @nn.compact
    def __call__(self, xs, xs_len, train: bool = False):
        return nn.Dense(self.output_size, name="linear")(xs), xs_len


class MeanPoolingLinear(nn.Module):
    output_size: int

    @nn.compact
    def __call__(self, xs, xs_len, train: bool = False):
        pooled = MeanPooling(name="pool")(xs, xs_len)
        return nn.Dense(self.output_size, name="linear")(pooled)


# ---------------------------------------------------------------------------
# RNN encoder for CTC ASR (reference: s3prl/nn/rnn.py RNNEncoder; SUPERB ASR
# uses a bidirectional LSTM stack + linear over CTC vocab)
# ---------------------------------------------------------------------------


class RNNEncoder(nn.Module):
    output_size: int
    hidden_size: int = 1024
    num_layers: int = 2
    bidirectional: bool = True
    dropout: float = 0.2
    proj_size: int = 1024

    @nn.compact
    def __call__(self, xs, xs_len, train: bool = False):
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size), name=f"lstm_fwd_{i}")
            out_f = fwd(xs, seq_lengths=xs_len)
            if self.bidirectional:
                bwd = nn.RNN(
                    nn.OptimizedLSTMCell(self.hidden_size),
                    reverse=True,
                    keep_order=True,
                    name=f"lstm_bwd_{i}",
                )
                out_b = bwd(xs, seq_lengths=xs_len)
                xs = jnp.concatenate([out_f, out_b], axis=-1)
            else:
                xs = out_f
            xs = nn.Dense(self.proj_size, name=f"proj_{i}")(xs)
            xs = nn.Dropout(self.dropout)(xs, deterministic=not train)
        return nn.Dense(self.output_size, name="final")(xs), xs_len


class FrameConcatLinear(nn.Module):
    """Concat +-(n//2) neighbouring frames then linear (reference:
    downstream/phone_linear_concat — modelrc concat_n_frames 9)."""

    output_size: int
    concat_n_frames: int = 9

    @nn.compact
    def __call__(self, xs, xs_len, train: bool = False):
        n = self.concat_n_frames
        half = n // 2
        shifted = [
            jnp.roll(xs, shift, axis=1) for shift in range(half, -half - 1, -1)
        ]
        xs = jnp.concatenate(shifted, axis=-1)
        return nn.Dense(self.output_size, name="linear")(xs), xs_len


class ConvBankHead(nn.Module):
    """Parallel same-padding conv bank probe (reference: downstream/
    timit_phone/model.py:14-42): linear -> relu -> dropout -> convs of each
    kernel size -> concat -> relu -> dropout -> linear."""

    output_size: int
    kernels: Tuple[int, ...] = (3, 5, 7)
    cnn_size: int = 32
    hidden_size: int = 64
    dropout: float = 0.5

    @nn.compact
    def __call__(self, xs, xs_len, train: bool = False):
        h = nn.relu(nn.Dense(self.hidden_size, name="in_linear")(xs))
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        feats = [
            nn.Conv(self.cnn_size, (k,), padding="SAME", name=f"cnn_{i}")(h)
            for i, k in enumerate(self.kernels)
        ]
        h = nn.relu(jnp.concatenate(feats, axis=-1))
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return nn.Dense(self.output_size, name="out_linear")(h), xs_len
