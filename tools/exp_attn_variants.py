"""Experiment: attention kernel variants for the extraction hot path.

Times each variant at the bench protocol shapes (B, T=499, C=1024, H=16)
with the on-device fori_loop + host-fetch pattern. One JSON line per
variant. Not part of the library — findings get ported into
s3prl_tpu/kernels/flash_attention.py.

Variants:
  cur    - current fused_qkv_attention ([B,T,3C] buffer, head-slice loop)
  xla    - attention_bthd (heads-last einsum, XLA)
  v2     - q/v from [B,T,2C] buffer + PRE-TRANSPOSED kT [B,C,T]:
           no in-kernel k transpose, recip folded into [BQ,Dh] output
  v2pen  - v2 without the penalty add (upper bound when unpadded)
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

B = int(os.environ.get("BENCH_BATCH", 128))
T = int(os.environ.get("BENCH_T", 499))
C, H = 1024, 16
Dh = C // H
ITERS = int(os.environ.get("BENCH_ITERS", 10))
DT = jnp.bfloat16
FLOPS = B * H * 2 * 2 * T * T * Dh  # QK + PV matmuls


def timeit(fn, *args):
    out = fn(*args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    float(np.asarray(fn(*args)))
    return (time.perf_counter() - t0) / ITERS


def report(name, ms, notes=""):
    print(json.dumps({"variant": name, "ms": round(ms * 1e3, 2),
                      "tflops": round(FLOPS / ms / 1e12, 1), "notes": notes}),
          flush=True)


def loop_over(fn, x):
    """fn: x -> out [B, T, C]-ish; chains a data dependency.

    The dependency is a 1-element dynamic_update_slice (in-place inside the
    XLA while loop) — NOT a full-buffer add, which costs ~3.6 ms/iter at
    these shapes and used to contaminate every measurement."""

    @jax.jit
    def loop(x):
        def body(i, carry):
            h, acc = carry
            o = fn(h)
            dep = h[:1, :1, :1] + 0.0 * o[:1, :1, :1].astype(h.dtype)
            return (jax.lax.dynamic_update_slice(h, dep, (0, 0, 0)),
                    acc + o[0, 0, 0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))
        return acc

    return loop


# ---------------------------------------------------------------- v2 kernel
def _v2_kernel(qv_ref, kt_ref, v_ref, kvlen_ref, o_ref, *, num_heads, scale,
               use_penalty):
    BQ = qv_ref.shape[0]
    Tk = kt_ref.shape[1]
    Cc = o_ref.shape[1]
    D = Cc // num_heads
    if use_penalty:
        kv_len = kvlen_ref[pl.program_id(0), 0]
        col = jax.lax.broadcasted_iota(jnp.int32, (BQ, Tk), 1)
        penalty = jnp.where(col < kv_len, 0.0, -1e9).astype(jnp.float32)
    for h in range(num_heads):
        q = qv_ref[:, h * D : (h + 1) * D]
        kt = kt_ref[h * D : (h + 1) * D, :]
        scores = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if use_penalty:
            scores = scores + penalty
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m)
        recip = 1.0 / jnp.sum(p, axis=1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[:, h * D : (h + 1) * D],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[:, h * D : (h + 1) * D] = (out * recip).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("num_heads", "use_penalty"))
def v2_attention(qv, kt, kv_lens, num_heads, use_penalty=True):
    Bb, Tt, C2 = qv.shape
    Cc = C2 // 2
    BQ = int(os.environ.get("BQ", 256))
    Tp = -(-Tt // BQ) * BQ
    if Tp != Tt:
        qv = jnp.pad(qv, ((0, 0), (0, Tp - Tt), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Tp - Tt)))
    out = pl.pallas_call(
        partial(_v2_kernel, num_heads=num_heads, scale=(Cc // num_heads) ** -0.5,
                use_penalty=use_penalty),
        out_shape=jax.ShapeDtypeStruct((Bb, Tp, Cc), qv.dtype),
        grid=(Bb, Tp // BQ),
        in_specs=[
            pl.BlockSpec((None, BQ, Cc), lambda b, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Cc, Tp), lambda b, iq: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Tp, Cc), lambda b, iq: (b, 0, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, BQ, Cc), lambda b, iq: (b, iq, 0),
                               memory_space=pltpu.VMEM),
    )(qv, kt, qv, kv_lens.reshape(Bb, 1).astype(jnp.int32))
    return out[:, :Tt]


# ------------------------------------------------------------- v3 kernel
# softmax denominator on the MXU: PV matmul gets a ones-column appended to
# V, so the row-sum of p rides the same matmul; VPU work per head is only
# rowmax + exp. Mask penalty optional (fast path when batch is unpadded).
def _v3_kernel(qv_ref, kt_ref, v_ref, kvlen_ref, o_ref, *, num_heads, scale,
               use_penalty, nosoftmax=False):
    BQ = qv_ref.shape[0]
    Tk = kt_ref.shape[1]
    Cc = o_ref.shape[1]
    D = Cc // num_heads
    ones = jnp.ones((Tk, 1), v_ref.dtype)
    if use_penalty:
        kv_len = kvlen_ref[pl.program_id(0), 0]
        col = jax.lax.broadcasted_iota(jnp.int32, (BQ, Tk), 1)
        penalty = jnp.where(col < kv_len, 0.0, -1e9).astype(jnp.float32)
    for h in range(num_heads):
        q = qv_ref[:, h * D : (h + 1) * D]
        kt = kt_ref[h * D : (h + 1) * D, :]
        scores = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if use_penalty:
            scores = scores + penalty
        if nosoftmax:
            p = scores.astype(v_ref.dtype)
        else:
            m = jnp.max(scores, axis=1, keepdims=True)
            p = jnp.exp(scores - m).astype(v_ref.dtype)
        ve = jnp.concatenate([v_ref[:, h * D : (h + 1) * D], ones], axis=1)
        pv = jax.lax.dot_general(
            p, ve, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, D+1]; last column = sum(p)
        if nosoftmax:
            o_ref[:, h * D : (h + 1) * D] = pv[:, :D].astype(o_ref.dtype)
        else:
            recip = 1.0 / pv[:, D:]
            o_ref[:, h * D : (h + 1) * D] = (pv[:, :D] * recip).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("num_heads", "use_penalty", "nosoftmax"))
def v3_attention(qv, kt, kv_lens, num_heads, use_penalty=True, nosoftmax=False):
    Bb, Tt, C2 = qv.shape
    Cc = C2 // 2
    BQ = int(os.environ.get("BQ", 256))
    Tp = -(-Tt // BQ) * BQ
    if Tp != Tt:
        qv = jnp.pad(qv, ((0, 0), (0, Tp - Tt), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Tp - Tt)))
    out = pl.pallas_call(
        partial(_v3_kernel, num_heads=num_heads, scale=(Cc // num_heads) ** -0.5,
                use_penalty=use_penalty, nosoftmax=nosoftmax),
        out_shape=jax.ShapeDtypeStruct((Bb, Tp, Cc), qv.dtype),
        grid=(Bb, Tp // BQ),
        in_specs=[
            pl.BlockSpec((None, BQ, Cc), lambda b, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Cc, Tp), lambda b, iq: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Tp, Cc), lambda b, iq: (b, 0, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, BQ, Cc), lambda b, iq: (b, iq, 0),
                               memory_space=pltpu.VMEM),
    )(qv, kt, qv, kv_lens.reshape(Bb, 1).astype(jnp.int32))
    return out[:, :Tt]


# ------------------------------------------------------------- v4 kernel
# grid (B, head-group, Tq): blocks sliced along C so every VMEM ref is
# 128-lane aligned (GH heads of 64 per group); BQ=512 queries per cell.
def _v4_kernel(q_ref, kt_ref, v_ref, kvlen_ref, o_ref, *, heads_per_group,
               scale, use_penalty, nosoftmax=False):
    BQ = q_ref.shape[0]
    Tk = kt_ref.shape[1]
    D = q_ref.shape[1] // heads_per_group
    if use_penalty:
        kv_len = kvlen_ref[pl.program_id(0), 0]
        col = jax.lax.broadcasted_iota(jnp.int32, (BQ, Tk), 1)
        penalty = jnp.where(col < kv_len, 0.0, -1e9).astype(jnp.float32)
    for h in range(heads_per_group):
        q = q_ref[:, h * D : (h + 1) * D]
        kt = kt_ref[h * D : (h + 1) * D, :]
        scores = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if use_penalty:
            scores = scores + penalty
        if nosoftmax:
            p = scores.astype(v_ref.dtype)
            recip = 1.0
        else:
            m = jnp.max(scores, axis=1, keepdims=True)
            e = jnp.exp(scores - m)
            recip = 1.0 / jnp.sum(e, axis=1, keepdims=True)
            p = e.astype(v_ref.dtype)
        pv = jax.lax.dot_general(
            p, v_ref[:, h * D : (h + 1) * D],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[:, h * D : (h + 1) * D] = (pv * recip).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("num_heads", "heads_per_group",
                                   "use_penalty", "nosoftmax"))
def v4_attention(qv, kt, kv_lens, num_heads, heads_per_group=2,
                 use_penalty=True, nosoftmax=False):
    Bb, Tt, C2 = qv.shape
    Cc = C2 // 2
    D = Cc // num_heads
    GC = heads_per_group * D  # channel width per cell
    BQ = int(os.environ.get("BQ4", 512))
    Tp = -(-Tt // BQ) * BQ
    if Tp != Tt:
        qv = jnp.pad(qv, ((0, 0), (0, Tp - Tt), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Tp - Tt)))
    n_groups = num_heads // heads_per_group
    out = pl.pallas_call(
        partial(_v4_kernel, heads_per_group=heads_per_group, scale=D ** -0.5,
                use_penalty=use_penalty, nosoftmax=nosoftmax),
        out_shape=jax.ShapeDtypeStruct((Bb, Tp, Cc), qv.dtype),
        grid=(Bb, n_groups, Tp // BQ),
        in_specs=[
            # q: rows for this query block, channels for this head group
            pl.BlockSpec((None, BQ, GC), lambda b, g, iq: (b, iq, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, GC, Tp), lambda b, g, iq: (b, g, 0),
                         memory_space=pltpu.VMEM),
            # v rides in the qv buffer's second half: channel-block index
            # offset by the number of q channel blocks
            pl.BlockSpec((None, Tp, GC),
                         lambda b, g, iq, ng=n_groups: (b, 0, ng + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, BQ, GC), lambda b, g, iq: (b, iq, g),
                               memory_space=pltpu.VMEM),
    )(qv, kt, qv, kv_lens.reshape(Bb, 1).astype(jnp.int32))
    return out[:, :Tt]


# ---------------------------------------------------------------- v9 diag
# FLOP-equivalent single big matmul chain per cell: q[BQ,C]@kt[C,T] then
# @v[T,C]. WRONG semantics — purely measures what the MXU could do if the
# per-head structure vanished.
def _v9_kernel(qv_ref, kt_ref, v_ref, kvlen_ref, o_ref):
    s = jax.lax.dot_general(
        qv_ref[:, : kt_ref.shape[0]], kt_ref[:, :],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    o = jax.lax.dot_general(
        s.astype(v_ref.dtype), v_ref[:, : o_ref.shape[1]],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    o_ref[:, :] = o.astype(o_ref.dtype)


# -------------------------------------------------------------- v10 kernel
# Block-diagonal head packing: PACK heads share one matmul pair with PACK x
# FLOP waste but large MXU shapes. kt_bd [PACK*D, PACK*T] and v_bd
# [PACK*T, PACK*D] are zero-filled block diagonals built in VMEM once per
# cell per group.
def _v10_kernel(qv_ref, kt_ref, v_ref, kvlen_ref, o_ref, *, num_heads, pack,
                scale, use_penalty):
    BQ = qv_ref.shape[0]
    Tk = kt_ref.shape[1]
    Cc = o_ref.shape[1]
    D = Cc // num_heads
    if use_penalty:
        kv_len = kvlen_ref[pl.program_id(0), 0]
        col = jax.lax.broadcasted_iota(jnp.int32, (BQ, pack * Tk), 1) % Tk
        penalty = jnp.where(col < kv_len, 0.0, -1e9).astype(jnp.float32)
    for g in range(num_heads // pack):
        h0 = g * pack
        # block-diagonal K^T: [pack*D, pack*T]
        kt_bd = jnp.zeros((pack * D, pack * Tk), kt_ref.dtype)
        v_bd = jnp.zeros((pack * Tk, pack * D), v_ref.dtype)
        for j in range(pack):
            h = h0 + j
            kt_bd = jax.lax.dynamic_update_slice(
                kt_bd, kt_ref[h * D : (h + 1) * D, :], (j * D, j * Tk))
            v_bd = jax.lax.dynamic_update_slice(
                v_bd, v_ref[:, h * D : (h + 1) * D], (j * Tk, j * D))
        q = qv_ref[:, h0 * D : (h0 + pack) * D]  # [BQ, pack*D]
        scores = jax.lax.dot_general(
            q, kt_bd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [BQ, pack*T] — per-head blocks side by side
        if use_penalty:
            scores = scores + penalty
        s3 = scores.reshape(BQ, pack, Tk)
        m = jnp.max(s3, axis=2, keepdims=True)
        e = jnp.exp(s3 - m)
        recip = 1.0 / jnp.sum(e, axis=2, keepdims=True)
        p = (e * recip).astype(v_ref.dtype).reshape(BQ, pack * Tk)
        pv = jax.lax.dot_general(
            p, v_bd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, pack*D]
        o_ref[:, h0 * D : (h0 + pack) * D] = pv.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("num_heads", "pack", "use_penalty", "diag"))
def v10_attention(qv, kt, kv_lens, num_heads, pack=4, use_penalty=True,
                  diag=False):
    Bb, Tt, C2 = qv.shape
    Cc = C2 // 2
    BQ = int(os.environ.get("BQ", 256))
    Tp = -(-Tt // BQ) * BQ
    if Tp != Tt:
        qv = jnp.pad(qv, ((0, 0), (0, Tp - Tt), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Tp - Tt)))
    kern = (_v9_kernel if diag else
            partial(_v10_kernel, num_heads=num_heads, pack=pack,
                    scale=(Cc // num_heads) ** -0.5, use_penalty=use_penalty))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Bb, Tp, Cc), qv.dtype),
        grid=(Bb, Tp // BQ),
        in_specs=[
            pl.BlockSpec((None, BQ, Cc), lambda b, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Cc, Tp), lambda b, iq: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Tp, Cc), lambda b, iq: (b, 0, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, BQ, Cc), lambda b, iq: (b, iq, 0),
                               memory_space=pltpu.VMEM),
    )(qv, kt, qv, kv_lens.reshape(Bb, 1).astype(jnp.int32))
    return out[:, :Tt]


def main():
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, T, 3 * C).astype(np.float32) * 0.05, DT)
    kv_lens = jnp.full((B,), T, jnp.int32)
    which = os.environ.get("VARIANTS", "cur,xla,v2,v2pen").split(",")

    if "cur" in which:
        from s3prl_tpu.kernels.flash_attention import fused_qkv_attention

        fn = loop_over(lambda x: fused_qkv_attention(x, kv_lens, H), qkv)
        report("cur", timeit(fn, qkv))

    if "xla" in which:
        from s3prl_tpu.ops.attention import attention_bthd

        def xla(x):
            r = x.reshape(B, T, 3, H, Dh)
            o = attention_bthd(r[:, :, 0] * (Dh ** -0.5), r[:, :, 1], r[:, :, 2],
                               None)
            return o.reshape(B, T, C)

        fn = loop_over(xla, qkv)
        report("xla", timeit(fn, qkv))

    # v2 input prep: qv buffer + kT, produced from the same random source.
    # In the real layer this comes straight from two projections (the kt one
    # via einsum 'btc,cd->bdt' so XLA emits the transposed-output matmul).
    qv = jnp.concatenate([qkv[:, :, :C], qkv[:, :, 2 * C :]], axis=-1)
    kt = jnp.transpose(qkv[:, :, C : 2 * C], (0, 2, 1))

    if "v2" in which:
        fn = loop_over(lambda x: v2_attention(x, kt, kv_lens, H, True), qv)
        report("v2", timeit(fn, qv))

    if "v2pen" in which:
        fn = loop_over(lambda x: v2_attention(x, kt, kv_lens, H, False), qv)
        report("v2pen", timeit(fn, qv), "no mask (upper bound)")

    if "v3" in which:
        fn = loop_over(lambda x: v3_attention(x, kt, kv_lens, H, True), qv)
        report("v3", timeit(fn, qv), "MXU denom")

    if "v3pen" in which:
        fn = loop_over(lambda x: v3_attention(x, kt, kv_lens, H, False), qv)
        report("v3pen", timeit(fn, qv), "MXU denom, no mask")

    if "v3null" in which:
        fn = loop_over(
            lambda x: v3_attention(x, kt, kv_lens, H, False, nosoftmax=True), qv
        )
        report("v3null", timeit(fn, qv), "no softmax at all (MXU-only bound)")

    if "v4" in which:
        fn = loop_over(lambda x: v4_attention(x, kt, kv_lens, H, 2, True), qv)
        report("v4", timeit(fn, qv), "2 heads/cell BQ=512 aligned")

    if "v4null" in which:
        fn = loop_over(
            lambda x: v4_attention(x, kt, kv_lens, H, 2, False, nosoftmax=True), qv
        )
        report("v4null", timeit(fn, qv), "2 heads/cell, no softmax")

    if "v5" in which:
        fn = loop_over(lambda x: v4_attention(x, kt, kv_lens, H, 4, True), qv)
        report("v5", timeit(fn, qv), "4 heads/cell BQ=512 aligned")

    if "v8" in which:
        fn = loop_over(lambda x: v4_attention(x, kt, kv_lens, H, 8, True), qv)
        report("v8", timeit(fn, qv), "8 heads/cell BQ=512 aligned")

    if "v9" in which:
        fn = loop_over(lambda x: v10_attention(x, kt, kv_lens, H, diag=True), qv)
        report("v9", timeit(fn, qv), "FLOP-equivalent big-matmul diagnostic")

    if "v9xla" in which:
        # same big-matmul chain in plain XLA (batched): what the MXU can do
        def chain(x):
            s = jnp.einsum("btc,bcs->bts", x[:, :, :C], kt,
                           preferred_element_type=jnp.float32)
            return jnp.einsum("bts,bsc->btc", s.astype(x.dtype), x[:, :, C:])

        fn = loop_over(chain, qv)
        report("v9xla", timeit(fn, qv), "XLA big-matmul chain")

    if "v12" in which:
        # empty kernel: same grid/blocks, body = copy q -> o. DMA + dispatch
        def _copy_kernel(qv_ref, kt_ref, v_ref, kvlen_ref, o_ref):
            o_ref[:, :] = qv_ref[:, : o_ref.shape[1]]

        @jax.jit
        def copy_attn(qv2):
            BQ = int(os.environ.get("BQ", 256))
            Tp = -(-T // BQ) * BQ
            qvp = jnp.pad(qv2, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else qv2
            ktp = jnp.pad(kt, ((0, 0), (0, 0), (0, Tp - T))) if Tp != T else kt
            out = pl.pallas_call(
                _copy_kernel,
                out_shape=jax.ShapeDtypeStruct((B, Tp, C), qv2.dtype),
                grid=(B, Tp // BQ),
                in_specs=[
                    pl.BlockSpec((None, BQ, C), lambda b, iq: (b, iq, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((None, C, Tp), lambda b, iq: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((None, Tp, C), lambda b, iq: (b, 0, 1),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((None, BQ, C), lambda b, iq: (b, iq, 0),
                                       memory_space=pltpu.VMEM),
            )(qvp, ktp, qvp, kv_lens.reshape(B, 1).astype(jnp.int32))
            return out[:, :T]

        fn = loop_over(copy_attn, qv)
        report("v12", timeit(fn, qv), "empty kernel: DMA+dispatch floor")

    if "harness0" in which:
        # loop-harness floor: trivial elementwise op, no pallas
        fn = loop_over(lambda x: x[:, :, :C] * 1.0001, qv)
        report("harness0", timeit(fn, qv), "loop dep + one slice-mul")

    if "hbm" in which:
        # raw HBM bandwidth: one full-buffer elementwise pass per iter
        nbytes = qv.size * 2 * 2  # read + write, bf16
        fn = loop_over(lambda x: x * 1.0001, qv)
        ms = timeit(fn, qv)
        print(json.dumps({"variant": "hbm", "ms": round(ms * 1e3, 2),
                          "gbps": round(nbytes / ms / 1e9, 1),
                          "notes": f"{qv.size*2/1e6:.0f} MB buffer copy-mul"}),
              flush=True)

    if "v12a" in which or "v12b" in which:
        def _copy_q(q_ref, o_ref):
            o_ref[:, :] = q_ref[:, : o_ref.shape[1]]

        def copy_attn2(qv2, BQ):
            Tp = -(-T // BQ) * BQ
            qvp = jnp.pad(qv2, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else qv2
            out = pl.pallas_call(
                _copy_q,
                out_shape=jax.ShapeDtypeStruct((B, Tp, C), qv2.dtype),
                grid=(B, Tp // BQ),
                in_specs=[pl.BlockSpec((None, BQ, C), lambda b, iq: (b, iq, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((None, BQ, C), lambda b, iq: (b, iq, 0),
                                       memory_space=pltpu.VMEM),
            )(qvp)
            return out[:, :T]

        if "v12a" in which:
            fn = loop_over(lambda x: copy_attn2(x, 256), qv)
            report("v12a", timeit(fn, qv), "copy kernel, q-only input, BQ=256")
        if "v12b" in which:
            fn = loop_over(lambda x: copy_attn2(x, 512), qv)
            report("v12b", timeit(fn, qv), "copy kernel, q-only input, BQ=512")

    if "v13" in which:
        # pallas MXU rate at block shapes: per cell [BQ,C]@[C,C] x2 chained
        w = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.02, DT)

        def _mm_kernel(q_ref, w_ref, o_ref):
            a = jax.lax.dot_general(q_ref[:, :w_ref.shape[0]], w_ref[:, :],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            b = jax.lax.dot_general(a.astype(w_ref.dtype), w_ref[:, :],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[:, :] = b.astype(o_ref.dtype)

        @jax.jit
        def mm(qv2):
            BQ = 256
            Tp = -(-T // BQ) * BQ
            qvp = jnp.pad(qv2, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else qv2
            out = pl.pallas_call(
                _mm_kernel,
                out_shape=jax.ShapeDtypeStruct((B, Tp, C), qv2.dtype),
                grid=(B, Tp // BQ),
                in_specs=[
                    pl.BlockSpec((None, BQ, C), lambda b, iq: (b, iq, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((C, C), lambda b, iq: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((None, BQ, C), lambda b, iq: (b, iq, 0),
                                       memory_space=pltpu.VMEM),
            )(qvp, w)
            return out[:, :T]

        fn = loop_over(mm, qv)
        ms = timeit(fn, qv)
        flops = B * 512 * C * C * 2 * 2
        print(json.dumps({"variant": "v13", "ms": round(ms * 1e3, 2),
                          "tflops": round(flops / ms / 1e12, 1),
                          "notes": "pallas [256,1024]@[1024,1024]x2 per cell"}),
              flush=True)

    if "v10p2" in which:
        fn = loop_over(lambda x: v10_attention(x, kt, kv_lens, H, pack=2), qv)
        report("v10p2", timeit(fn, qv), "block-diag pack=2")

    if "v10p4" in which:
        fn = loop_over(lambda x: v10_attention(x, kt, kv_lens, H, pack=4), qv)
        report("v10p4", timeit(fn, qv), "block-diag pack=4")


if __name__ == "__main__":
    main()
