"""Round-5 encoder-kernel tiling experiments (VERDICT r4 next #1).

Localizes the measured gap between the whole-block serving kernels and the
330 TOP/s int8 roof (attn block 0.927 ms/layer vs ~0.61 ideal; FFN 0.975 vs
~0.81 at the bench protocol B=32, T=499, C=1024, FFN=4096, H=16):

attention-block probes (all [B,T,C]->[B,T,C], chained marginal timing):
  attn_base      the serving fused_attention_block as-is
  attn_h8        SAME FLOPs, 8 fake heads of Dh=128: every per-head q/k/v
                 slice is lane-aligned and the scores GEMM has K=128 —
                 isolates the Dh=64 misalignment + half-MXU penalty
                 (numerics differ; perf probe only)
  attn_nosm      softmax replaced by a scale (both GEMMs kept) — isolates
                 the VPU softmax cost (numerics differ; probe only)
  attn_f32       per-head attention math in f32 instead of bf16 (probe)
ffn probes:
  ffn_base       the serving fused_int8_ffn as-is
  ffn_pipe       chunk loop manually software-pipelined: GEMM1 of chunk
                 c+1 issued before the VPU dequant/GELU/requant of chunk c,
                 so Mosaic can overlap MXU with VPU (same numerics)
  ffn_relu       GELU -> relu (isolates the activation's VPU cost; probe)

Usage: VARIANT=attn_h8 python tools/exp_encoder_tiles.py
"""

import json
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3prl_tpu.kernels.conv_frontend import _gelu, _quant_rows8
from s3prl_tpu.kernels.flash_attention import _exp_fast

B = int(os.environ.get("BENCH_BATCH", 32))
T, C, FFN, H = 499, 1024, 4096, 16
IT_LO, IT_HI = int(os.environ.get("IT_LO", 6)), int(os.environ.get("IT_HI", 24))
REPS = int(os.environ.get("REPS", 3))

ATTN_GEMM_FLOPS = 2 * B * T * C * (3 * C + C)
ATTN_SDPA_FLOPS = 2 * 2 * B * H * T * T * (C // H)
FFN_GEMM_FLOPS = 2 * B * T * C * 2 * FFN


def _fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(np.asarray(leaf.reshape(-1)[0]))


# ---------------------------------------------------------------- attention


def _attn_kernel_var(x_ref, wq_ref, bq_ref, wqs_ref, ln_ref, wo_ref, wos_ref,
                     bo_ref, kvlen_ref, o_ref, *, num_heads, scale, softmax,
                     attn_f32, vpu_bf16=False, out_bf16=False,
                     static_scales=None):
    Tk = x_ref.shape[0]
    Cc = o_ref.shape[1]
    Dh = Cc // num_heads
    x_in = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x_in, axis=1, keepdims=True)
    var = jnp.mean((x_in - mean) ** 2, axis=1, keepdims=True)
    xn = (x_in - mean) * jax.lax.rsqrt(var + 1e-5) * ln_ref[0, :] + ln_ref[1, :]
    if static_scales is not None:
        # static (calibrated) activation scales: the per-row max-abs reduce
        # and the divide vanish; the dequant scale folds into wqs/wos
        # OUTSIDE the kernel (the caller pre-multiplies). Probe numerics.
        sx_c, sa_c = static_scales
        x8 = jnp.clip(jnp.round(xn * (1.0 / sx_c)), -127, 127).astype(jnp.int8)
        s_x = jnp.float32(1.0)  # folded into wqs_ref by the caller
    else:
        s_x = jnp.maximum(jnp.max(jnp.abs(xn), axis=1, keepdims=True), 1e-8) / 127.0
        x8 = jnp.clip(jnp.round(xn / s_x), -127, 127).astype(jnp.int8)
    qkv_raw = jax.lax.dot_general(
        x8, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if vpu_bf16:
        # dequant directly in bf16 (VPU probe): int32 accums carry 0.4%
        # bf16 rounding vs the 0.8% int8 requant step
        qkv = (qkv_raw.astype(jnp.bfloat16)
               * (s_x * wqs_ref[0, :]).astype(jnp.bfloat16)
               + bq_ref[0, :].astype(jnp.bfloat16))
    else:
        dt = jnp.float32 if attn_f32 else jnp.bfloat16
        qkv = (qkv_raw.astype(jnp.float32) * s_x * wqs_ref[0, :]
               + bq_ref[0, :]).astype(dt)
    kv_len = kvlen_ref[pl.program_id(0), 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (Tk, Tk), 1)
    penalty = jnp.where(col < kv_len, 0.0, -1e9).astype(jnp.float32)
    heads = []
    for h in range(num_heads):
        q = qkv[:, h * Dh : (h + 1) * Dh]
        k = qkv[:, Cc + h * Dh : Cc + (h + 1) * Dh]
        v = qkv[:, 2 * Cc + h * Dh : 2 * Cc + (h + 1) * Dh]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + penalty
        if softmax:
            m = jnp.max(scores, axis=1, keepdims=True)
            p = _exp_fast(scores - m)
            recip = 1.0 / jnp.sum(p, axis=1, keepdims=True)
            p = p * recip
        else:
            p = scores * (1.0 / Tk)
        heads.append(jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16 if vpu_bf16 else jnp.float32))
    attn = jnp.concatenate(heads, axis=1)
    if static_scales is not None:
        sa_inv = (jnp.bfloat16(1.0 / sa_c) if vpu_bf16
                  else jnp.float32(1.0 / sa_c))
        a8 = jnp.clip(jnp.round((attn * sa_inv).astype(jnp.float32)),
                      -127, 127).astype(jnp.int8)
        s_a = jnp.float32(1.0)  # folded into wos_ref by the caller
    elif vpu_bf16:
        s_a = (jnp.maximum(jnp.max(jnp.abs(attn), axis=1, keepdims=True),
                           jnp.bfloat16(1e-6)) / jnp.bfloat16(127.0))
        a8 = jnp.clip(jnp.round((attn / s_a).astype(jnp.float32)),
                      -127, 127).astype(jnp.int8)
        s_a = s_a.astype(jnp.float32)
    else:
        s_a = jnp.maximum(jnp.max(jnp.abs(attn), axis=1, keepdims=True), 1e-8) / 127.0
        a8 = jnp.clip(jnp.round(attn / s_a), -127, 127).astype(jnp.int8)
    y_raw = jax.lax.dot_general(
        a8, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if out_bf16:
        # epilogue fully in bf16: dequant + bias + residual with the raw
        # bf16 x (no f32 x_in reuse) — o_ref is bf16 anyway
        y = (y_raw.astype(jnp.bfloat16)
             * (s_a * wos_ref[0, :]).astype(jnp.bfloat16)
             + bo_ref[0, :].astype(jnp.bfloat16) + x_ref[...])
        o_ref[...] = y
    else:
        y = (y_raw.astype(jnp.float32) * s_a * wos_ref[0, :]
             + bo_ref[0, :] + x_in)
        o_ref[...] = y.astype(o_ref.dtype)


def make_attn_variant(num_heads=H, softmax=True, attn_f32=False,
                      vpu_bf16=False, out_bf16=False, static=False):
    rng = np.random.RandomState(0)
    wq = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.02)
    wo = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.02)
    bq = jnp.zeros((3 * C,), jnp.float32)
    bo = jnp.zeros((C,), jnp.float32)
    ln2 = jnp.stack([jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32)])

    from s3prl_tpu.ops.quant import quantize_cols

    wq_q, wq_s = quantize_cols(wq)
    wo_q, wo_s = quantize_cols(wo)
    static_scales = None
    if static:
        # representative calibrated scales for the probe's N(0,1)-ish LN
        # output / attention output; dequant scales pre-folded here
        sx_c, sa_c = 3.5 / 127.0, 2.5 / 127.0
        static_scales = (sx_c, sa_c)
        wq_s = wq_s * sx_c
        wo_s = wo_s * sa_c
    Dh = C // num_heads
    Tp = -(-T // 128) * 128
    kv_lens = jnp.full((B, 1), T, jnp.int32)

    def block(x):
        xp = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
        out = pl.pallas_call(
            partial(_attn_kernel_var, num_heads=num_heads, scale=Dh ** -0.5,
                    softmax=softmax, attn_f32=attn_f32, vpu_bf16=vpu_bf16,
                    out_bf16=out_bf16, static_scales=static_scales),
            out_shape=jax.ShapeDtypeStruct((B, Tp, C), x.dtype),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((None, Tp, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 3 * C), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * C), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * C), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((None, Tp, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(xp, wq_q, bq.reshape(1, 3 * C), wq_s.reshape(1, 3 * C), ln2,
          wo_q, wo_s.reshape(1, C), bo.reshape(1, C), kv_lens)
        return out[:, :T]

    return block, ATTN_GEMM_FLOPS + ATTN_SDPA_FLOPS


def make_attn_base():
    from s3prl_tpu.kernels.flash_attention import fused_attention_block

    rng = np.random.RandomState(0)
    wq = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.02)
    wo = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.02)
    bq = jnp.zeros((3 * C,), jnp.float32)
    bo = jnp.zeros((C,), jnp.float32)
    g = jnp.ones((C,), jnp.float32)
    be = jnp.zeros((C,), jnp.float32)
    kv_lens = jnp.full((B,), T, jnp.int32)

    def block(x):
        return fused_attention_block(x, wq, bq, (g, be), wo, bo, kv_lens, H)

    return block, ATTN_GEMM_FLOPS + ATTN_SDPA_FLOPS


# ---------------------------------------------------------------------- ffn



FCHUNK = int(os.environ.get("S3PRL_FCHUNK", "2048"))
FBQ = int(os.environ.get("S3PRL_BQF", "512"))


def _ffn_kernel_pipe(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w1s_ref, w2s_ref,
                     ln_ref, o_ref, *, bounds, gelu_mode, pipe=True,
                     vpu_bf16=False, static_scales=None):
    """Software-pipelined chunk loop: GEMM1(c+1) is issued before the VPU
    epilogue of chunk c, giving Mosaic an independent MXU op to overlap
    with the dequant/GELU/requant VPU chain. pipe=False keeps the serving
    kernel's sequential order (isolates the prequant-weights effect)."""
    x_in = x_ref[:, :].astype(jnp.float32)
    mean = jnp.mean(x_in, axis=1, keepdims=True)
    var = jnp.mean((x_in - mean) ** 2, axis=1, keepdims=True)
    x = (x_in - mean) * jax.lax.rsqrt(var + 1e-5) * ln_ref[0, :] + ln_ref[1, :]
    if static_scales is not None:
        sx_c, sh_c = static_scales
        x8 = jnp.clip(jnp.round(x * (1.0 / sx_c)), -127, 127).astype(jnp.int8)
        xs = jnp.float32(1.0)  # folded into w1s_ref by the caller
    else:
        x8, xs = _quant_rows8(x)
    C_out = o_ref.shape[1]
    acc = jnp.zeros((x.shape[0], C_out), jnp.float32)

    def gemm1(lo, hi):
        return jax.lax.dot_general(
            x8, w1_ref[:, lo:hi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    h_next = gemm1(*bounds[0]) if pipe else None
    for ci, (lo, hi) in enumerate(bounds):
        if pipe:
            h_raw = h_next
            if ci + 1 < len(bounds):
                h_next = gemm1(*bounds[ci + 1])  # MXU, indep of the VPU below
        else:
            h_raw = gemm1(lo, hi)
        if static_scales is not None:
            h = (h_raw.astype(jnp.float32) * w1s_ref[0, lo:hi]
                 + b1_ref[0, lo:hi])
            h = _gelu(h, gelu_mode)
            h8 = jnp.clip(jnp.round(h * (1.0 / sh_c)),
                          -127, 127).astype(jnp.int8)
            hs = jnp.float32(1.0)  # folded into w2s_ref by the caller
        elif vpu_bf16:
            # the whole dequant/GELU/requant chain in bf16: int32 accums up
            # to ~1.6e7 carry 0.4% bf16 rounding, same order as the int8
            # requant step itself (perf probe; quality-gate before adoption)
            h = (h_raw.astype(jnp.bfloat16) * (xs * w1s_ref[0, lo:hi]).astype(jnp.bfloat16)
                 + b1_ref[0, lo:hi].astype(jnp.bfloat16))
            h = _gelu(h, gelu_mode)
            s = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True),
                            jnp.bfloat16(1e-6)) / jnp.bfloat16(127.0)
            # Mosaic has no bf16 roundeven: the round itself upcasts
            h8 = jnp.clip(jnp.round((h / s).astype(jnp.float32)),
                          -127, 127).astype(jnp.int8)
            hs = s.astype(jnp.float32)
        else:
            h = h_raw.astype(jnp.float32) * xs * w1s_ref[0, lo:hi] + b1_ref[0, lo:hi]
            h = _gelu(h, gelu_mode)
            h8, hs = _quant_rows8(h)
        y = jax.lax.dot_general(
            h8, w2_ref[lo:hi, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        acc = acc + y * hs * w2s_ref[0, :]
    o_ref[:, :] = (acc + b2_ref[0, :] + x_in).astype(o_ref.dtype)


def make_ffn_variant(pipe=True, gelu_mode="tanh", chunk=None, vpu_bf16=False,
                     static=False):
    rng = np.random.RandomState(0)
    w1 = jnp.asarray(rng.randn(C, FFN).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.randn(FFN, C).astype(np.float32) * 0.02)
    b1 = jnp.zeros((FFN,), jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)
    ln2 = jnp.stack([jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32)])

    from s3prl_tpu.ops.quant import quantize_cols

    w1q, w1s = quantize_cols(w1)
    w2q, w2s = quantize_cols(w2)
    static_scales = None
    if static:
        sx_c, sh_c = 3.5 / 127.0, 2.5 / 127.0
        static_scales = (sx_c, sh_c)
        w1s = w1s * sx_c
        w2s = w2s * sh_c
    rows = B * T
    Rp = -(-rows // FBQ) * FBQ
    ch = chunk or FCHUNK
    bounds = tuple(
        (s, min(s + ch, FFN)) for s in range(0, FFN, ch)
    )

    def block(x):
        x2 = x.reshape(rows, C)
        x2 = jnp.pad(x2, ((0, Rp - rows), (0, 0))) if Rp != rows else x2
        out = pl.pallas_call(
            partial(_ffn_kernel_pipe, bounds=bounds, gelu_mode=gelu_mode,
                    pipe=pipe, vpu_bf16=vpu_bf16,
                    static_scales=static_scales),
            out_shape=jax.ShapeDtypeStruct((Rp, C), x.dtype),
            grid=(Rp // FBQ,),
            in_specs=[
                pl.BlockSpec((FBQ, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, FFN), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, FFN), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((FFN, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, FFN), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((FBQ, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x2, w1q, b1.reshape(1, FFN), w2q, b2.reshape(1, C),
          w1s.reshape(1, FFN), w2s.reshape(1, C), ln2)
        return out[:rows].reshape(B, T, C)

    return block, FFN_GEMM_FLOPS


def make_ffn_base():
    from s3prl_tpu.kernels.ffn import fused_int8_ffn

    rng = np.random.RandomState(0)
    w1 = jnp.asarray(rng.randn(C, FFN).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.randn(FFN, C).astype(np.float32) * 0.02)
    b1 = jnp.zeros((FFN,), jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)
    g = jnp.ones((C,), jnp.float32)
    be = jnp.zeros((C,), jnp.float32)

    def block(x):
        return fused_int8_ffn(x, w1, b1, w2, b2, ln=(g, be), residual=True)

    return block, FFN_GEMM_FLOPS


def _attn_min_kernel(x_ref, wq_ref, wo_ref, o_ref, *, num_heads):
    """MXU-floor probe: the attention block's GEMM chain with MINIMAL VPU
    (no LN/quant/softmax/dequant — x truncate-cast to int8, int32 results
    truncate-cast onward). Wrong numerics; measures what the dependent GEMM
    chain alone can sustain in this exact grid/block structure."""
    Tk = x_ref.shape[0]
    Cc = o_ref.shape[1]
    Dh = Cc // num_heads
    x8 = x_ref[...].astype(jnp.int8)
    qkv = jax.lax.dot_general(
        x8, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.bfloat16)
    heads = []
    for h in range(num_heads):
        q = qkv[:, h * Dh : (h + 1) * Dh]
        k = qkv[:, Cc + h * Dh : Cc + (h + 1) * Dh]
        v = qkv[:, 2 * Cc + h * Dh : 2 * Cc + (h + 1) * Dh]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        heads.append(jax.lax.dot_general(
            scores.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    attn8 = jnp.concatenate(heads, axis=1).astype(jnp.int8)
    y = jax.lax.dot_general(
        attn8, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = y.astype(o_ref.dtype)


def make_attn_min():
    rng = np.random.RandomState(0)
    from s3prl_tpu.ops.quant import quantize_cols

    wq_q, _ = quantize_cols(jnp.asarray(rng.randn(C, 3 * C).astype(np.float32)))
    wo_q, _ = quantize_cols(jnp.asarray(rng.randn(C, C).astype(np.float32)))
    Tp = -(-T // 128) * 128

    def block(x):
        xp = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
        out = pl.pallas_call(
            partial(_attn_min_kernel, num_heads=H),
            out_shape=jax.ShapeDtypeStruct((B, Tp, C), x.dtype),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((None, Tp, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 3 * C), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, Tp, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(xp, wq_q, wo_q)
        return out[:, :T]

    return block, ATTN_GEMM_FLOPS + ATTN_SDPA_FLOPS


def _ffn_min_kernel(x_ref, w1_ref, w2_ref, o_ref, *, bounds):
    """MXU-floor probe for the FFN chain: GEMM1 -> truncate-cast int8 ->
    GEMM2 per chunk, zero dequant/GELU/requant. Wrong numerics."""
    x8 = x_ref[...].astype(jnp.int8)
    C_out = o_ref.shape[1]
    acc = jnp.zeros((x8.shape[0], C_out), jnp.int32)
    for lo, hi in bounds:
        g1 = jax.lax.dot_general(
            x8, w1_ref[:, lo:hi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h8 = g1.astype(jnp.int8)
        acc = acc + jax.lax.dot_general(
            h8, w2_ref[lo:hi, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    o_ref[...] = acc.astype(o_ref.dtype)


def make_ffn_min():
    rng = np.random.RandomState(0)
    from s3prl_tpu.ops.quant import quantize_cols

    w1q, _ = quantize_cols(jnp.asarray(rng.randn(C, FFN).astype(np.float32)))
    w2q, _ = quantize_cols(jnp.asarray(rng.randn(FFN, C).astype(np.float32)))
    rows = B * T
    Rp = -(-rows // FBQ) * FBQ
    bounds = tuple((s, min(s + FCHUNK, FFN)) for s in range(0, FFN, FCHUNK))

    def block(x):
        x2 = x.reshape(rows, C)
        x2 = jnp.pad(x2, ((0, Rp - rows), (0, 0))) if Rp != rows else x2
        out = pl.pallas_call(
            partial(_ffn_min_kernel, bounds=bounds),
            out_shape=jax.ShapeDtypeStruct((Rp, C), x.dtype),
            grid=(Rp // FBQ,),
            in_specs=[
                pl.BlockSpec((FBQ, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, FFN), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((FFN, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((FBQ, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x2, w1q, w2q)
        return out[:rows].reshape(B, T, C)

    return block, FFN_GEMM_FLOPS


VARIANTS = {
    "attn_base": make_attn_base,
    "attn_var": partial(make_attn_variant),  # sanity twin of attn_base
    "attn_h8": partial(make_attn_variant, num_heads=8),
    "attn_h4": partial(make_attn_variant, num_heads=4),
    "attn_nosm": partial(make_attn_variant, softmax=False),
    "attn_v16": partial(make_attn_variant, vpu_bf16=True),
    "attn_v16o": partial(make_attn_variant, vpu_bf16=True, out_bf16=True),
    "attn_static": partial(make_attn_variant, vpu_bf16=True, out_bf16=True,
                           static=True),
    "attn_f32": partial(make_attn_variant, attn_f32=True),
    "attn_min": make_attn_min,
    "ffn_min": make_ffn_min,
    "ffn_base": make_ffn_base,
    "ffn_pipe": partial(make_ffn_variant, pipe=True),
    "ffn_seq": partial(make_ffn_variant, pipe=False),
    "ffn_v16": partial(make_ffn_variant, pipe=False, vpu_bf16=True),
    "ffn_v16_pipe": partial(make_ffn_variant, pipe=True, vpu_bf16=True),
    "ffn_pipe1024": partial(make_ffn_variant, pipe=True, chunk=1024),
    "ffn_pipe512": partial(make_ffn_variant, pipe=True, chunk=512),
    "ffn_v16_pipe1024": partial(make_ffn_variant, pipe=True, chunk=1024,
                                vpu_bf16=True),
    "ffn_static": partial(make_ffn_variant, pipe=False, static=True),
    "ffn_static_pipe": partial(make_ffn_variant, pipe=True, static=True),
    "ffn_gelu2": partial(make_ffn_variant, pipe=False, gelu_mode="tanh2"),
    "ffn_relu": partial(make_ffn_variant, gelu_mode="relu"),
    "ffn_seq_erf": partial(make_ffn_variant, pipe=False, gelu_mode="erf"),
}


def main():
    """Interleaved A/B: tunnel noise between processes AND between
    back-to-back measurements inside one process is ~10-25% (round-5
    measurement), far above the deltas under test. So: compile every
    requested variant's two chain lengths up front, then time reps
    ROUND-ROBIN (a_lo, b_lo, ..., a_hi, b_hi, ... x REPS) — drift hits all
    variants equally and the per-variant best-of cancels glitches."""
    names = os.environ.get("VARIANT", "attn_base").split(",")
    key = jax.random.key(0)
    x0 = jax.jit(lambda k: jax.random.normal(k, (B, T, C), jnp.bfloat16) * 0.5)(key)
    _fetch(x0)

    fns, flopss = {}, {}
    for name in names:
        block, flops = VARIANTS[name]()
        flopss[name] = flops

        def make(iters, block=block):
            @jax.jit
            def run(x):
                return jax.lax.fori_loop(0, iters, lambda i, h: block(h), x)

            return run

        try:
            for it in (IT_LO, IT_HI):
                fn = make(it)
                _fetch(fn(x0))  # compile + warm
                fns[(name, it)] = fn
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            fns.pop((name, IT_LO), None)
            names = [n for n in names if n != name]

    times = {k: float("inf") for k in fns}
    for _ in range(REPS):
        for it in (IT_LO, IT_HI):
            for name in names:
                fn = fns[(name, it)]
                t0 = time.perf_counter()
                _fetch(fn(x0))
                times[(name, it)] = min(times[(name, it)],
                                        time.perf_counter() - t0)

    for name in names:
        per = (times[(name, IT_HI)] - times[(name, IT_LO)]) / (IT_HI - IT_LO)
        print(json.dumps({
            "variant": name,
            "knobs": {k: os.environ.get(k) for k in
                      ("S3PRL_BQF", "S3PRL_FCHUNK", "S3PRL_GELU", "BENCH_BATCH")
                      if os.environ.get(k)},
            "ms": round(per * 1e3, 3),
            "tops_effective": round(flopss[name] / per / 1e12, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
