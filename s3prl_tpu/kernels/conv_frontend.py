"""Pallas TPU kernel: fused waveform conv0 + LayerNorm + GELU.

The first layer of the wav2vec2/HuBERT conv extractor (C_in=1, k=10, s=5)
expands the waveform 512x: its output is the largest tensor in the entire
extraction pipeline ([B, T/5, 512] — 4.2 GB at B=128/10 s), and the XLA
lowering materializes it around the following LayerNorm/GELU, measured at
80 ms per forward on v5e (tools/bench_components.py conv_layer0, 0.5 TF/s).

This kernel computes conv -> LayerNorm(fp32) -> exact GELU in one VMEM pass
per (batch, frame-chunk) grid cell, writing the activated output once. The
k=10/s=5 window is expressed as two stride-5 phase views of the wav so the
block specs stay non-overlapping; LayerNorm statistics are row-wise (per
frame over 512 channels), matching nn.LayerNorm(eps=1e-5, fp32) exactly.
Only the "layer_norm" extractor mode fuses (the Base-style GroupNorm needs
whole-time statistics); CPU falls back to interpret mode.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 2048  # output frames per grid cell


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7 — far
    below bf16 output rounding); Mosaic has no erf primitive."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(a_ref, b_ref, w_ref, scale_ref, bias_ref, o_ref):
    patches = jnp.concatenate([a_ref[0], b_ref[0]], axis=1)  # [CT, k]
    y = jax.lax.dot_general(
        patches, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [CT, C] fp32
    mean = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.mean((y - mean) ** 2, axis=1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    y = y * 0.5 * (1.0 + _erf(y / math.sqrt(2.0)))  # exact-GELU (A&S erf)
    o_ref[0] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("stride", "k", "interpret"))
def conv0_ln_gelu(wavs, kernel, scale, bias, stride: int = 5, k: int = 10,
                  interpret: bool = False):
    """wavs[B, T] -> GELU(LN(conv1d(wavs)))[B, (T-k)//stride+1, C].

    kernel [k, 1, C] (nn.Conv layout), scale/bias [C] (nn.LayerNorm params).
    Requires k == 2*stride (the wav2vec2 front end's 10/5).
    """
    assert k == 2 * stride, (k, stride)
    B, T = wavs.shape
    C = kernel.shape[-1]
    T_out = (T - k) // stride + 1
    n_blocks = -(-T_out // CHUNK)
    Tp_out = n_blocks * CHUNK

    need = Tp_out * stride + stride  # phase views need one extra stride group
    wav_p = jnp.pad(wavs, ((0, 0), (0, max(need - T, 0))))[:, :need]
    x5a = wav_p[:, : Tp_out * stride].reshape(B, Tp_out, stride)
    x5b = wav_p[:, stride : Tp_out * stride + stride].reshape(B, Tp_out, stride)
    w = kernel.reshape(k, C).astype(wavs.dtype)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, Tp_out, C), wavs.dtype),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, CHUNK, stride), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, stride), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CHUNK, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x5a, x5b, w, scale.reshape(1, C), bias.reshape(1, C))
    return out[:, :T_out]
