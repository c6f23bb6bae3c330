"""Pallas TPU kernel: fused int8 W8A8 transformer FFN.

fc1 -> bias -> GELU -> fc2 -> bias in one VMEM-resident pass per
(batch, row-block) grid cell. Why this is the shape of the win on this
hardware (measured, tools/bench_int8.py + exp_attn_variants.py):

- the XLA lowering writes the [B, T, 4C] fc1 activation to HBM and reads it
  back (~1 GB per HuBERT-Large layer at B=128/10 s), and the dynamic-quant
  XLA path adds dequant/requant passes — on this chip's measured effective
  HBM bandwidth (~170-230 GB/s through the tunnel) that traffic dominates;
- int8 weights halve the weight stream and run the MXU at ~1.8x the bf16
  rate (chain_int8 179 TOP/s vs chain_bf16 99 TF/s at the FFN shapes).

Here the intermediate activation never leaves VMEM: the FFN dim is processed
in chunks, each chunk dequantized, GELU'd (A&S erf — Mosaic has no erf
primitive), requantized per row, and accumulated into the output in f32.
Weights ride as grid-constant blocks (fetched once per layer). Activation
scales are dynamic symmetric per row (per token), per chunk for the second
matmul — strictly finer than the XLA QuantDense path.

Forward-only (serving); training and CPU fall back to ops/quant.int8_matmul.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_frontend import _erf

BQ = 256  # rows per grid cell
CHUNK = 1024  # FFN columns per in-kernel chunk


def _quant_rows(x):
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w1s_ref, w2s_ref,
                o_ref, *, chunks):
    x = x_ref[:, :].astype(jnp.float32)
    x8, xs = _quant_rows(x)
    C_out = o_ref.shape[1]
    acc = jnp.zeros((x.shape[0], C_out), jnp.float32)
    ffn = w1_ref.shape[1]
    ch = ffn // chunks
    for c in range(chunks):
        sl = slice(c * ch, (c + 1) * ch)
        h = jax.lax.dot_general(
            x8, w1_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        h = h * xs * w1s_ref[0, sl] + b1_ref[0, sl]
        h = h * 0.5 * (1.0 + _erf(h / math.sqrt(2.0)))  # exact-GELU
        h8, hs = _quant_rows(h)
        y = jax.lax.dot_general(
            h8, w2_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        acc = acc + y * hs * w2s_ref[0, :]
    o_ref[:, :] = (acc + b2_ref[0, :]).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def fused_int8_ffn(x, w1, b1, w2, b2, interpret: bool = False):
    """x [B, T, C] -> fc2(gelu(fc1(x))) [B, T, C] with W8A8 quantization.

    w1 [C, FFN], w2 [FFN, C] in checkpoint dtype; quantized per output
    channel here (XLA, trivial vs the activation work).
    """
    B, T, C = x.shape
    FFN = w1.shape[1]
    w1s = jnp.maximum(jnp.max(jnp.abs(w1.astype(jnp.float32)), axis=0), 1e-8) / 127.0
    w1q = jnp.clip(jnp.round(w1.astype(jnp.float32) / w1s), -127, 127).astype(jnp.int8)
    w2s = jnp.maximum(jnp.max(jnp.abs(w2.astype(jnp.float32)), axis=0), 1e-8) / 127.0
    w2q = jnp.clip(jnp.round(w2.astype(jnp.float32) / w2s), -127, 127).astype(jnp.int8)

    rows = B * T
    Rp = -(-rows // BQ) * BQ
    x2 = x.reshape(rows, C)
    if Rp != rows:
        x2 = jnp.pad(x2, ((0, Rp - rows), (0, 0)))
    chunks = max(FFN // CHUNK, 1)
    out = pl.pallas_call(
        partial(_ffn_kernel, chunks=chunks),
        out_shape=jax.ShapeDtypeStruct((Rp, C), x.dtype),
        grid=(Rp // BQ,),
        in_specs=[
            pl.BlockSpec((BQ, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, FFN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FFN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FFN, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FFN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQ, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x2, w1q, b1.reshape(1, FFN).astype(jnp.float32), w2q,
        b2.reshape(1, C).astype(jnp.float32),
        w1s.reshape(1, FFN), w2s.reshape(1, C),
    )
    return out[:rows].reshape(B, T, C)
