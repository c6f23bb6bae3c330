"""Pallas TPU kernel: grouped conv positional embedding + GELU.

The wav2vec2 positional embedding (reference wav2vec2_model.py:2937
make_conv_pos; models/transformer.py ConvPositionalEmbedding) is a grouped
1-D conv (k=128, groups=16, same-pad, trailing frame dropped) + GELU. XLA's
`feature_group_count` lowering sustains only 38-53 TF/s on v5e at the
serving shapes ([32, 499, 1024]) — 7 ms of the 72.7 ms path — and every
XLA-level reformulation measured slower (PARITY.md: batch_group_count
5.5 TF/s, 16-tap einsum 19.5 TF/s).

This kernel restructures the grouped conv so the MXU sees long-K GEMMs:
grid over (group, batch); per cell the group's full padded time window
[T+k, Cg] lives in VMEM and the k taps are consumed in chunks of TC=16 as
one [T, TC*Cg] x [TC*Cg, Cg] GEMM each (im2col built by static slices, no
HBM duplication), accumulating in f32. Bias + exact-or-tanh GELU fuse into
the epilogue; the conv output never exists unactivated in HBM.

Serving-only (forward). VMEM bounds the un-blocked T at ~2048 frames
(mat [T, TC*Cg] bf16 + window + weights); the wrapper asserts and the
model falls back to XLA beyond it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_frontend import _gelu

TC = 16  # taps consumed per GEMM chunk: K = TC * Cg = 1024 at Cg=64


def _kernel(x_ref, w_ref, b_ref, o_ref, *, k, t_out, gelu_mode):
    win = x_ref[0, :, 0, :]  # [T_pad, Cg]
    cg = win.shape[1]
    acc = jnp.zeros((t_out, cg), jnp.float32)
    for c in range(k // TC):
        mat = jnp.concatenate(
            [win[c * TC + j : c * TC + j + t_out] for j in range(TC)], axis=1
        )  # [T_out, TC*Cg]
        acc = acc + jax.lax.dot_general(
            mat, w_ref[0, c * TC * cg : (c + 1) * TC * cg, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    y = _gelu(acc + b_ref[0].astype(jnp.float32), gelu_mode)
    o_ref[0, :, 0, :] = y.astype(o_ref.dtype)


def _kernel_q8(xq_ref, xs_ref, w_ref, ws_ref, b_ref, o_ref, *, k, t_out,
               gelu_mode):
    """int8 twin of _kernel: the window is quantized per (batch, group) with
    ONE symmetric scale (xs), weights per output channel (ws); the K=TC*Cg
    GEMMs run on the int8 MXU path and the f32 rescale + bias + GELU fuse
    into the epilogue."""
    win = xq_ref[0, :, 0, :]  # [T_pad, Cg] int8
    cg = win.shape[1]
    acc = jnp.zeros((t_out, cg), jnp.int32)
    for c in range(k // TC):
        mat = jnp.concatenate(
            [win[c * TC + j : c * TC + j + t_out] for j in range(TC)], axis=1
        )  # [T_out, TC*Cg] int8
        acc = acc + jax.lax.dot_general(
            mat, w_ref[0, c * TC * cg : (c + 1) * TC * cg, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
    y = acc.astype(jnp.float32) * xs_ref[0, 0] * ws_ref[0].astype(jnp.float32)
    y = _gelu(y + b_ref[0].astype(jnp.float32), gelu_mode)
    o_ref[0, :, 0, :] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("groups", "interpret", "gelu_mode"))
def pos_conv_gelu_q8(x, kernel, bias, groups: int = 16,
                     interpret: bool = False, gelu_mode: str = None):
    """int8 W8A8 variant of pos_conv_gelu: activations quantized with one
    symmetric scale per (batch, group) window, weights per (group, out
    channel). The N=64 grouped GEMM runs at the int8 MXU rate instead of
    bf16. Serving-only; precision pinned by tests/test_kernels.py."""
    B, T, C = x.shape
    k, cg, _ = kernel.shape
    G = groups
    assert C % G == 0 and cg == C // G, (C, G, cg)
    assert k % TC == 0, k
    pad = k // 2
    x_pad = jnp.pad(x, ((0, 0), (pad, pad - 1 + (k % 2)), (0, 0)))
    T_pad = x_pad.shape[1]
    xg = x_pad.reshape(B, T_pad, G, cg)

    # per-(batch, group) symmetric window scale
    amax = jnp.max(jnp.abs(xg.astype(jnp.float32)), axis=(1, 3))  # [B, G]
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(
        jnp.round(xg.astype(jnp.float32) / xs[:, None, :, None]), -127, 127
    ).astype(jnp.int8)

    # weights: per-(group, out-channel) scales
    wg = kernel.astype(jnp.float32).reshape(k, cg, G, cg).transpose(2, 0, 1, 3)
    wg = wg.reshape(G, k * cg, cg)
    wmax = jnp.maximum(jnp.max(jnp.abs(wg), axis=1, keepdims=True), 1e-8)
    ws = wmax / 127.0  # [G, 1, cg]
    wq = jnp.clip(jnp.round(wg / ws), -127, 127).astype(jnp.int8)
    bg = bias.reshape(G, 1, cg)

    out = pl.pallas_call(
        partial(_kernel_q8, k=k, t_out=T, gelu_mode=gelu_mode),
        out_shape=jax.ShapeDtypeStruct((B, T, G, cg), x.dtype),
        grid=(G, B),
        in_specs=[
            pl.BlockSpec((1, T_pad, 1, cg), lambda g, b: (b, 0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda g, b: (b, g),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k * cg, cg), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cg), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cg), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, 1, cg), lambda g, b: (b, 0, g, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xq, xs, wq, ws, bg)
    return out.reshape(B, T, C)


@partial(jax.jit, static_argnames=("groups", "interpret", "gelu_mode"))
def pos_conv_gelu(x, kernel, bias, groups: int = 16, interpret: bool = False,
                  gelu_mode: str = None):
    """GELU(grouped same-pad conv1d(x)) with the trailing frame dropped.

    x [B, T, C]; kernel [k, C/groups, C] (nn.Conv grouped layout); bias [C].
    Matches ConvPositionalEmbedding's depth-1 path (k even) exactly.
    """
    B, T, C = x.shape
    k, cg, _ = kernel.shape
    G = groups
    assert C % G == 0 and cg == C // G, (C, G, cg)
    assert k % TC == 0, k
    pad = k // 2
    # same-pad; even k emits T+1 rows and the reference drops the last ->
    # rows 0..T-1, each reading x_pad[i : i+k]
    x_pad = jnp.pad(x, ((0, 0), (pad, pad - 1 + (k % 2)), (0, 0)))
    T_pad = x_pad.shape[1]
    xg = x_pad.reshape(B, T_pad, G, cg)

    # [k, cg, C] -> per group g the [k*cg, cg] im2col weight, tap-major rows
    wg = kernel.astype(x.dtype).reshape(k, cg, G, cg).transpose(2, 0, 1, 3)
    wg = wg.reshape(G, k * cg, cg)
    bg = bias.reshape(G, 1, cg)

    out = pl.pallas_call(
        partial(_kernel, k=k, t_out=T, gelu_mode=gelu_mode),
        out_shape=jax.ShapeDtypeStruct((B, T, G, cg), x.dtype),
        grid=(G, B),  # g outer: the group's weights stay resident across B
        in_specs=[
            pl.BlockSpec((1, T_pad, 1, cg), lambda g, b: (b, 0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * cg, cg), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cg), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, 1, cg), lambda g, b: (b, 0, g, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xg, wg, bg)
    return out.reshape(B, T, C)
