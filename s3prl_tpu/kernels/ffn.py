"""Pallas TPU kernels: fused int8 W8A8 transformer projections.

Two kernels for the pre-LN serving path:

- ``fused_int8_ffn``: [LN ->] fc1 -> bias -> GELU -> fc2 -> bias [-> +x]
  in one VMEM-resident pass per (row-block) grid cell.
- ``fused_int8_linear``: [LN ->] matmul -> bias [-> +residual] — covers the
  QKV projection (LN folded in) and the attention output projection
  (residual folded in).

Why this is the shape of the win on this hardware (measured,
tools/bench_int8.py + bench_components.py):

- the XLA lowering writes the [B, T, 4C] fc1 activation to HBM and reads it
  back (~1 GB per HuBERT-Large layer at B=128/10 s), and the dynamic-quant
  XLA path adds dequant/requant passes — on this chip's measured effective
  HBM bandwidth (~170-230 GB/s through the tunnel) that traffic dominates;
- int8 weights halve the weight stream and run the MXU above the bf16 rate
  (chain_int8 179 TOP/s vs chain_bf16 99 TF/s at the FFN shapes);
- with LN/residual folded in, each layer tensor makes exactly one HBM round
  trip per fused stage — the separate f32 LayerNorm read-modify-write and
  the residual-add pass disappear.

The FFN intermediate activation never leaves VMEM: the FFN dim is processed
in chunks, each chunk dequantized, GELU'd (tanh-approximate on this int8
serving path — max abs err ~3e-3, below the requant step, ~0.13 ms/layer
cheaper than the A&S erf poly; S3PRL_GELU=erf restores exact), requantized
per row, and accumulated into the output in f32.
Weights ride as grid-constant blocks (fetched once per layer). Activation
scales are dynamic symmetric per row (per token), per chunk for the second
matmul — strictly finer than the XLA QuantDense path.

Forward-only (serving); training and CPU fall back to ops/quant.int8_matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_frontend import _gelu, _quant_rows8 as _quant_rows

BQ = int(__import__("os").environ.get("S3PRL_BQF", "512"))  # rows per grid cell (FFN kernel; 512 measured ~3% over 256 at the serving protocol)
BQL = int(__import__("os").environ.get("S3PRL_BQL", "512"))  # rows per cell, linear kernel
_CHUNK_ENV = __import__("os").environ.get("S3PRL_FCHUNK")
CHUNK = int(_CHUNK_ENV) if _CHUNK_ENV else 2048  # FFN columns per in-kernel chunk at large FFN (2048 measured best on HuBERT-Large: 3,288 vs 3,260/3,208 at 1024/512)


def _chunk_for(ffn: int) -> int:
    """Effective chunk width: a SINGLE chunk when the whole FFN dim fits
    the VMEM budget (measured +1.4% on HuBERT-Base, FFN=3072: 9,635 vs
    9,504 audio-sec/s — the accumulator loop and its per-chunk requant
    epilogue vanish); the env override wins when set."""
    if _CHUNK_ENV:
        return CHUNK
    return ffn if ffn <= 3072 else CHUNK


def _layernorm(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _ffn_chunk_bounds(ffn: int):
    """Chunk boundaries covering ALL of the FFN dim (the last chunk may be
    shorter); every boundary stays lane-aligned for ffn % 128 == 0."""
    chunk = _chunk_for(ffn)
    bounds = []
    start = 0
    while start < ffn:
        end = min(start + chunk, ffn)
        bounds.append((start, end))
        start = end
    return tuple(bounds)


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w1s_ref, w2s_ref,
                ln_ref, o_ref, *, bounds, ln, residual, gelu_mode="tanh",
                postnorm=False):
    """postnorm=False: [LN ->] ffn [-> +x]  (pre-LN block, LN in prologue).
    postnorm=True:  LN(x + ffn(x))          (post-LN block, LN in epilogue)."""
    x_in = x_ref[:, :].astype(jnp.float32)
    x = _layernorm(x_in, ln_ref[0, :], ln_ref[1, :]) if ln and not postnorm else x_in
    x8, xs = _quant_rows(x)
    C_out = o_ref.shape[1]
    acc = jnp.zeros((x.shape[0], C_out), jnp.float32)
    for lo, hi in bounds:
        sl = slice(lo, hi)
        h = jax.lax.dot_general(
            x8, w1_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        h = h * xs * w1s_ref[0, sl] + b1_ref[0, sl]
        h = _gelu(h, gelu_mode)
        h8, hs = _quant_rows(h)
        y = jax.lax.dot_general(
            h8, w2_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        acc = acc + y * hs * w2s_ref[0, :]
    out = acc + b2_ref[0, :]
    if residual:
        out = out + x_in
    if postnorm:
        out = _layernorm(out, ln_ref[0, :], ln_ref[1, :])
    o_ref[:, :] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("residual", "postnorm", "interpret"))
def _ffn_call(x, w1q, b1, w2q, b2, w1s, w2s, ln2, residual, postnorm=False,
              interpret=False):
    B, T, C = x.shape
    FFN = w1q.shape[1]
    rows = B * T
    Rp = -(-rows // BQ) * BQ
    x2 = x.reshape(rows, C)
    if Rp != rows:
        x2 = jnp.pad(x2, ((0, Rp - rows), (0, 0)))
    assert FFN % 128 == 0, FFN  # lane-aligned chunk boundaries
    bounds = _ffn_chunk_bounds(FFN)
    ln = ln2 is not None
    if not ln:
        ln2 = jnp.zeros((2, C), jnp.float32)
    out = pl.pallas_call(
        partial(_ffn_kernel, bounds=bounds, ln=ln, residual=residual,
                postnorm=postnorm),
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
            pl.BlockSpec((2, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQ, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x2, w1q, b1.reshape(1, FFN).astype(jnp.float32), w2q,
        b2.reshape(1, C).astype(jnp.float32),
        w1s.reshape(1, FFN), w2s.reshape(1, C), ln2,
    )
    return out[:rows].reshape(B, T, C)


def _quant_cols_np(w):
    from ..ops.quant import as_quantized_cols  # single source of the scheme

    return as_quantized_cols(w)


def fused_int8_ffn(x, w1, b1, w2, b2, ln=None, residual: bool = False,
                   postnorm: bool = False, interpret: bool = False):
    """x [B, T, C] -> [x +] fc2(gelu(fc1([LN](x)))) with W8A8 quantization.

    w1 [C, FFN], w2 [FFN, C] in checkpoint dtype — or pre-quantized
    (int8, scales) pairs from the model's qcache collection (re-quantizing
    per forward costs real VPU+HBM time; ops/quant.cached_quantize_cols).
    `ln` is an optional (scale[C], bias[C]) tuple applied to x before fc1
    (the pre-LN block's final_layer_norm); `residual=True` adds the pre-LN
    x back to the output. ``postnorm=True`` moves the LN to the epilogue —
    LN(x + ffn(x)), the post-LN (HuBERT-Base family) block order.
    """
    if postnorm:
        assert ln is not None and residual, "postnorm is LN(x + ffn(x))"
    w1q, w1s = _quant_cols_np(w1)
    w2q, w2s = _quant_cols_np(w2)
    ln2 = (
        jnp.stack([ln[0].astype(jnp.float32), ln[1].astype(jnp.float32)])
        if ln is not None else None
    )
    interpret = interpret or jax.default_backend() == "cpu"
    return _ffn_call(x, w1q, b1, w2q, b2, w1s, w2s, ln2, residual=residual,
                     postnorm=postnorm, interpret=interpret)


def _linear_kernel(x_ref, r_ref, wq_ref, b_ref, ws_ref, ln_ref, o_ref, *,
                   ln, residual):
    x_in = x_ref[:, :].astype(jnp.float32)
    x = _layernorm(x_in, ln_ref[0, :], ln_ref[1, :]) if ln else x_in
    x8, xs = _quant_rows(x)
    y = jax.lax.dot_general(
        x8, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * xs * ws_ref[0, :] + b_ref[0, :]
    if residual:
        y = y + r_ref[:, :].astype(jnp.float32)
    o_ref[:, :] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _linear_call(x, residual, wq, b, ws, ln2, interpret=False):
    B, T, C = x.shape
    N = wq.shape[1]
    rows = B * T
    Rp = -(-rows // BQL) * BQL
    x2 = x.reshape(rows, C)
    has_res = residual is not None
    r2 = residual.reshape(rows, N) if has_res else jnp.zeros((1, N), x.dtype)
    if Rp != rows:
        x2 = jnp.pad(x2, ((0, Rp - rows), (0, 0)))
        if has_res:
            r2 = jnp.pad(r2, ((0, Rp - rows), (0, 0)))
    ln = ln2 is not None
    if not ln:
        ln2 = jnp.zeros((2, C), jnp.float32)
    out = pl.pallas_call(
        partial(_linear_kernel, ln=ln, residual=has_res),
        out_shape=jax.ShapeDtypeStruct((Rp, N), x.dtype),
        grid=(Rp // BQL,),
        in_specs=[
            pl.BlockSpec((BQL, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            (
                pl.BlockSpec((BQL, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
                if has_res
                else pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM)
            ),
            pl.BlockSpec((C, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQL, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, r2, wq, b.reshape(1, N).astype(jnp.float32), ws.reshape(1, N), ln2)
    return out[:rows].reshape(B, T, N)


def fused_int8_linear(x, w, b, ln=None, residual=None, interpret: bool = False):
    """x [B, T, C] -> [LN](x) @ w + b [+ residual], W8A8 quantized.

    `w`: raw [C, N] weights or a pre-quantized (int8, scales) qcache pair.
    `ln`: optional (scale[C], bias[C]) folded before the matmul (the pre-LN
    block's self_attn_layer_norm feeding the QKV projection). `residual`:
    optional [B, T, N] tensor added after the bias (the attention block's
    skip connection folded into the output projection).
    """
    wq, ws = _quant_cols_np(w)
    ln2 = (
        jnp.stack([ln[0].astype(jnp.float32), ln[1].astype(jnp.float32)])
        if ln is not None else None
    )
    interpret = interpret or jax.default_backend() == "cpu"
    return _linear_call(x, residual, wq, b, ws, ln2, interpret=interpret)


# ------------------------------------------------------------------ bf16 FFN

BF16_CHUNK = int(__import__("os").environ.get("S3PRL_FCHUNK16", "1024"))


def _ffn_bf16_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ln_ref, o_ref,
                     acc_ref, *, n_chunks, ln, residual, gelu_mode,
                     postnorm=False):
    """bf16 twin of _ffn_kernel with the weights STREAMED: at C=1024/FFN=4096
    the bf16 fc1+fc2 pair is 16 MB — beyond VMEM residency — so the FFN dim
    rides the minor grid axis and Mosaic double-buffers [C, CH]/[CH, C]
    weight panels while the MXU works. The [rows, FFN] intermediate still
    never leaves VMEM (one [rows, CH] slab at a time); acc_ref carries the
    f32 partial sum across chunk iterations of the same row block."""
    ci = pl.program_id(1)
    x_in = x_ref[:, :].astype(jnp.float32)
    x = _layernorm(x_in, ln_ref[0, :], ln_ref[1, :]) if ln and not postnorm else x_in
    h = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = _gelu(h + b1_ref[0, :], gelu_mode)
    y = jax.lax.dot_general(
        h.astype(jnp.bfloat16), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ci == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += y

    @pl.when(ci == n_chunks - 1)
    def _flush():
        out = acc_ref[...] + b2_ref[0, :]
        if residual:
            out = out + x_in
        if postnorm:
            out = _layernorm(out, ln_ref[0, :], ln_ref[1, :])
        o_ref[:, :] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("residual", "gelu_mode", "postnorm",
                                   "interpret"))
def _ffn_bf16_call(x, w1, b1, w2, b2, ln2, residual, gelu_mode="erf",
                   postnorm=False, interpret=False):
    B, T, C = x.shape
    FFN = w1.shape[1]
    rows = B * T
    Rp = -(-rows // BQ) * BQ
    x2 = x.reshape(rows, C)
    if Rp != rows:
        x2 = jnp.pad(x2, ((0, Rp - rows), (0, 0)))
    # largest lane-aligned panel width <= BF16_CHUNK that divides FFN
    # (grid-mapped weight panels must tile the FFN dim exactly)
    assert FFN % 128 == 0, FFN
    CH = min(BF16_CHUNK, FFN)
    while FFN % CH:
        CH -= 128
    n_chunks = FFN // CH
    ln = ln2 is not None
    if not ln:
        ln2 = jnp.zeros((2, C), jnp.float32)
    out = pl.pallas_call(
        partial(_ffn_bf16_kernel, n_chunks=n_chunks, ln=ln,
                residual=residual, gelu_mode=gelu_mode, postnorm=postnorm),
        out_shape=jax.ShapeDtypeStruct((Rp, C), x.dtype),
        grid=(Rp // BQ, n_chunks),
        in_specs=[
            pl.BlockSpec((BQ, C), lambda i, ci: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, CH), lambda i, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH), lambda i, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, C), lambda i, ci: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda i, ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQ, C), lambda i, ci: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BQ, C), jnp.float32)],
        interpret=interpret,
    )(
        x2, w1.astype(jnp.bfloat16), b1.reshape(1, FFN).astype(jnp.float32),
        w2.astype(jnp.bfloat16), b2.reshape(1, C).astype(jnp.float32), ln2,
    )
    return out[:rows].reshape(B, T, C)


def fused_bf16_ffn(x, w1, b1, w2, b2, ln=None, residual: bool = False,
                   postnorm: bool = False, interpret: bool = False):
    """x [B, T, C] -> [x +] fc2(gelu(fc1([LN](x)))) in bf16 — the
    reference-precision serving twin of fused_int8_ffn. Exact erf GELU
    (A&S poly, max err 1.5e-7 — the bf16 path keeps reference precision);
    f32 accumulation throughout; the [rows, FFN] intermediate never
    round-trips HBM (the XLA lowering materializes it: ~134 MB/layer at
    the serving protocol). ``postnorm=True`` moves the LN to the epilogue
    — LN(x + ffn(x)), the post-LN (HuBERT-Base family) block order."""
    if postnorm:
        assert ln is not None and residual, "postnorm is LN(x + ffn(x))"
    ln2 = (
        jnp.stack([ln[0].astype(jnp.float32), ln[1].astype(jnp.float32)])
        if ln is not None else None
    )
    interpret = interpret or jax.default_backend() == "cpu"
    return _ffn_bf16_call(x, w1, b1, w2, b2, ln2, residual=residual,
                          postnorm=postnorm, interpret=interpret)
