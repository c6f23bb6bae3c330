"""Pallas TPU kernel: grouped conv positional embedding + GELU.

The wav2vec2 positional embedding (reference wav2vec2_model.py:2937
make_conv_pos; models/transformer.py ConvPositionalEmbedding) is a grouped
1-D conv (k=128, groups=16, same-pad, trailing frame dropped) + GELU. XLA's
`feature_group_count` lowering sustains only 38-53 TF/s on v5e at the
serving shapes ([32, 499, 1024]) — 7 ms of the 72.7 ms path — and every
XLA-level reformulation measured slower (PARITY.md: batch_group_count
5.5 TF/s, 16-tap einsum 19.5 TF/s).

This kernel restructures the grouped conv so the MXU sees long-K GEMMs.
XLA pre-builds a TC-wide shift stack xsh[b, g, t, j*cg+c] = x_pad[b, t+j,
g*cg+c] (TC copies of the window — ~TC x the window bytes, still ~30x less
than a full k-tap im2col); per (group, batch) grid cell the stack lives in
VMEM and the k taps are consumed in chunks of TC as one
[T, TC*Cg] x [TC*Cg, Cg] GEMM per chunk — the chunk's im2col matrix is a
SUBLANE-ALIGNED static slice xsh[c*TC : c*TC+T] (TC matches the dtype's
sublane tile: 16 for bf16, 32 for int8), so Mosaic never sees a
phase-shifted concatenate. Bias + exact-or-tanh GELU fuse into the
epilogue; the conv output never exists unactivated in HBM.

Serving-only (forward). VMEM bounds the un-blocked T at ~2048 frames
(stack [T+k-TC, TC*Cg] + weights + out); the wrapper asserts and the model
falls back to XLA beyond it.

MEASURED OUTCOME (round 4, on-chip A/B, tools/bench_posconv.py, marginal
timing at [32, 499, 1024]): XLA 3.77 ms (71.1 TF/s — better than the 38-53
seen in the full path) vs this kernel 5.87 ms bf16 and 24.2 ms int8 (the
TC-wide shift-stack build + whole-stack quantize dominate). Both variants
are numerically pinned (cosine 0.99999 / 0.9999 vs f32) but LOSE; the
serving default stays on XLA's grouped lowering and these remain opt-in
via S3PRL_POSCONV=pallas|pallas_q8 for other TPU generations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_frontend import _gelu

TC = 16  # taps per GEMM chunk, bf16 (== bf16 sublane tile): K = TC*Cg = 1024
TC_Q8 = 32  # taps per chunk, int8 (== int8 sublane tile): K = 2048


def _kernel(x_ref, w_ref, b_ref, o_ref, *, k, t_out, tc, gelu_mode):
    xsh = x_ref[0, 0]  # [Tw, tc*Cg] shift stack
    cg = o_ref.shape[-1]
    acc = jnp.zeros((t_out, cg), jnp.float32)
    for c in range(k // tc):
        mat = xsh[c * tc : c * tc + t_out, :]  # sublane-aligned static slice
        acc = acc + jax.lax.dot_general(
            mat, w_ref[0, c * tc * cg : (c + 1) * tc * cg, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    y = _gelu(acc + b_ref[0].astype(jnp.float32), gelu_mode)
    o_ref[0, 0, :, :] = y.astype(o_ref.dtype)


def _kernel_q8(xq_ref, w_ref, s_ref, b_ref, o_ref, *, k, t_out, tc,
               gelu_mode):
    """int8 twin of _kernel: the shift stack is quantized per (batch, group)
    with ONE symmetric scale, weights per (group, out-channel); the two
    scales arrive pre-multiplied as one [1, cg] row per (b, g) cell (s_ref),
    so the f32 rescale + bias + GELU fuse into the epilogue. (A (1,1) SMEM
    block for the activation scale fails Mosaic's block-shape rules on real
    TPU — interpret mode doesn't catch that.)"""
    xsh = xq_ref[0, 0]  # [Tw, tc*Cg] int8
    cg = o_ref.shape[-1]
    acc = jnp.zeros((t_out, cg), jnp.int32)
    for c in range(k // tc):
        mat = xsh[c * tc : c * tc + t_out, :]
        acc = acc + jax.lax.dot_general(
            mat, w_ref[0, c * tc * cg : (c + 1) * tc * cg, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
    y = acc.astype(jnp.float32) * s_ref[0, 0]
    y = _gelu(y + b_ref[0].astype(jnp.float32), gelu_mode)
    o_ref[0, 0, :, :] = y.astype(o_ref.dtype)


def _shift_stack(x_pad, B, T, G, cg, k, tc):
    """[B, T_pad, C] -> [B, G, Tw, tc*cg] with xsh[b,g,t,j*cg+c] =
    x_pad[b, t+j, g*cg+c]; Tw = T + k - tc so chunk c's rows c*tc..c*tc+T
    cover taps c*tc..c*tc+tc-1."""
    xg = x_pad.reshape(B, x_pad.shape[1], G, cg)
    tw = T + k - tc
    xsh = jnp.stack([xg[:, j : j + tw] for j in range(tc)], axis=3)
    return xsh.transpose(0, 2, 1, 3, 4).reshape(B, G, tw, tc * cg), tw


def _tap_major_weights(kernel, k, cg, G):
    """[k, cg, C] -> per group g the [k*cg, cg] im2col weight, tap-major
    rows (row (tap*cg + ci) multiplies stack column (j*cg + ci))."""
    wg = kernel.reshape(k, cg, G, cg).transpose(2, 0, 1, 3)
    return wg.reshape(G, k * cg, cg)


@partial(jax.jit, static_argnames=("groups", "interpret", "gelu_mode"))
def pos_conv_gelu_q8(x, kernel, bias, groups: int = 16,
                     interpret: bool = False, gelu_mode: str = None):
    """int8 W8A8 variant of pos_conv_gelu: activations quantized with one
    symmetric scale per (batch, group) window, weights per (group, out
    channel). The grouped GEMMs run at the int8 MXU rate instead of bf16.
    Serving-only; precision pinned by tests/test_kernels.py."""
    B, T, C = x.shape
    k, cg, _ = kernel.shape
    G = groups
    tc = TC_Q8
    assert C % G == 0 and cg == C // G, (C, G, cg)
    assert k % tc == 0, k
    assert T <= 2048, f"T={T} beyond the kernel's VMEM bound; use XLA"
    pad = k // 2
    x_pad = jnp.pad(x, ((0, 0), (pad, pad - 1 + (k % 2)), (0, 0)))
    xsh, tw = _shift_stack(x_pad, B, T, G, cg, k, tc)

    # per-(batch, group) symmetric stack scale
    amax = jnp.max(jnp.abs(xsh.astype(jnp.float32)), axis=(2, 3))  # [B, G]
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(
        jnp.round(xsh.astype(jnp.float32) / xs[:, :, None, None]), -127, 127
    ).astype(jnp.int8)

    # weights: per-(group, out-channel) scales
    wg = _tap_major_weights(kernel.astype(jnp.float32), k, cg, G)
    wmax = jnp.maximum(jnp.max(jnp.abs(wg), axis=1, keepdims=True), 1e-8)
    ws = wmax / 127.0  # [G, 1, cg]
    wq = jnp.clip(jnp.round(wg / ws), -127, 127).astype(jnp.int8)
    bg = bias.reshape(G, 1, cg)
    # pre-multiplied rescale: [B, G, 1, cg] (activation scale x weight scale)
    sc = xs[:, :, None, None] * ws[None]

    out = pl.pallas_call(
        partial(_kernel_q8, k=k, t_out=T, tc=tc, gelu_mode=gelu_mode),
        out_shape=jax.ShapeDtypeStruct((B, G, T, cg), x.dtype),
        grid=(G, B),
        in_specs=[
            pl.BlockSpec((1, 1, tw, tc * cg), lambda g, b: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * cg, cg), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, cg), lambda g, b: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cg), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, T, cg), lambda g, b: (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xq, wq, sc, bg)
    return out.transpose(0, 2, 1, 3).reshape(B, T, C)


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
    tc = TC
    assert C % G == 0 and cg == C // G, (C, G, cg)
    assert k % tc == 0, k
    assert T <= 2048, f"T={T} beyond the kernel's VMEM bound; use XLA"
    pad = k // 2
    # same-pad; even k emits T+1 rows and the reference drops the last ->
    # rows 0..T-1, each reading x_pad[i : i+k]
    x_pad = jnp.pad(x, ((0, 0), (pad, pad - 1 + (k % 2)), (0, 0)))
    xsh, tw = _shift_stack(x_pad, B, T, G, cg, k, tc)

    wg = _tap_major_weights(kernel.astype(x.dtype), k, cg, G)
    bg = bias.reshape(G, 1, cg)

    out = pl.pallas_call(
        partial(_kernel, k=k, t_out=T, tc=tc, gelu_mode=gelu_mode),
        out_shape=jax.ShapeDtypeStruct((B, G, T, cg), x.dtype),
        grid=(G, B),  # g outer: the group's weights stay resident across B
        in_specs=[
            pl.BlockSpec((1, 1, tw, tc * cg), lambda g, b: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * cg, cg), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cg), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, T, cg), lambda g, b: (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xsh, wg, bg)
    return out.transpose(0, 2, 1, 3).reshape(B, T, C)
