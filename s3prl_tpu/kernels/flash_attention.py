"""Pallas TPU kernel: fused attention with gated relative-position bias.

The hot op of WavLM's encoder (SURVEY hard part #4; reference behavior:
s3prl/upstream/wavlm/modules.py:532-556): attention scores receive an
additive bias `gate[b,h,i] * pos_bias[h,i,j]` before the softmax. The naive
XLA lowering materializes the [B, H, T, T] gated bias in HBM per layer
(~256 MB for B=32, T=500) — this kernel computes the gating, bias add,
padding mask, fp32 softmax, and the PV matmul in one VMEM-resident pass per
(batch, head, query-block) grid cell: the [T, T] tensors never leave VMEM.

Speech SUPERB sequence lengths (<=1500 frames at 20 ms) keep whole K/V rows
in VMEM, so the hot kernels skip the K-block online-softmax loop; the query
dimension is still blocked to bound VMEM. Sequences beyond MAX_KERNEL_T
route to the K-blocked online-softmax kernels (`online_flash_attention`,
and `_gated_online_flash_kernel` for the gated-bias variant — pos_bias
[H, T, T] streams from HBM in [BQ, BK] blocks, so the [B, H, T, T] gated
product never materializes anywhere); this is the long-audio serving path
(60 s diarization-shaped inputs run without chunking).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_KERNEL_T = 2048  # beyond this, VMEM would overflow -> XLA fallback

_LOG2E = 1.4426950408889634


def _exp_fast(x):
    """exp via exp2 — on the TPU VPU exp lowers through exp2 anyway, and
    folding the log2(e) scale into the subtract-max pass saves a pass."""
    return jnp.exp2(x * _LOG2E)


def _query_block(T: int) -> int:
    """Whole-T query blocks when the [T, T] score tile fits VMEM comfortably
    (fewer grid cells -> K/V loaded once per (b, h)); else 128-row blocks."""
    if T <= 1024:
        return -(-T // 128) * 128  # T padded to the 128 lane requirement
    return 128


def _bq_env(default: int) -> int:
    """S3PRL_BQ overrides the serving kernels' query-block rows (on-chip
    tile sweeps; must be a multiple of 128)."""
    import os

    v = os.environ.get("S3PRL_BQ")
    return int(v) if v else default


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, kvlen_ref, o_ref):
    """Grid cell (h, iq, b): one query block against all keys.

    q_ref: [BQ, Dh]; k_ref/v_ref: [T, Dh]; bias_ref: [T_pos rows = BQ, T]
    (pre-sliced by the index map); gate_ref: [BQ, 1]; kvlen_ref: [1, 1] SMEM.

    The batch dimension is INNERMOST on purpose: the pos_bias block index
    (h, iq) is then constant across the B consecutive inner steps, so the
    Pallas pipeline fetches each [BQ, T] f32 bias block once per (h, iq)
    instead of once per (b, h, iq) — at serving shapes (B=32, T=499) that
    is ~0.5 GB/layer of redundant HBM bias traffic removed.
    """
    q = q_ref[:].astype(jnp.float32)  # [BQ, Dh]
    k = k_ref[:].astype(jnp.float32)  # [T, Dh]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, T]
    gate = gate_ref[:].astype(jnp.float32).reshape(-1, 1)  # [BQ, 1]
    scores = scores + gate * bias_ref[:].astype(jnp.float32)
    T = scores.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (scores.shape[0], T), 1)
    kv_len = kvlen_ref[pl.program_id(2), 0]
    scores = jnp.where(col < kv_len, scores, -1e9)
    m = jnp.max(scores, axis=1, keepdims=True)
    p = _exp_fast(scores - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    out = jax.lax.dot_general(
        p, v_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (out / denom).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _gated_bias_attention_kernel(q, k, v, pos_bias, gate, kv_lens, interpret=False):
    B, H, T, Dh = q.shape
    BQ = _query_block(T)
    Tp = -(-T // BQ) * BQ  # pad queries to the block size
    if Tp != T:
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        biasp = jnp.pad(pos_bias, ((0, 0), (0, Tp - T), (0, 0)))
        gatep = jnp.pad(gate, ((0, 0), (0, 0), (0, Tp - T)))
    else:
        qp, biasp, gatep = q, pos_bias, gate

    grid = (H, Tp // BQ, B)  # batch innermost: bias block reused across B
    out = pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, Dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, None, BQ, Dh), lambda h, i, b: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, T, Dh), lambda h, i, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, T, Dh), lambda h, i, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, BQ, T), lambda h, i, b: (h, i, 0),
                         memory_space=pltpu.VMEM),
            # gate rides as [B, H, T, 1]: a squeezed rank-1 block fails the
            # Mosaic (8, 128)-tile check; the trailing singleton keeps the
            # block 2-D with a dimension equal to the array's
            pl.BlockSpec((None, None, BQ, 1), lambda h, i, b: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kv_lens [B,1], whole array
        ],
        out_specs=pl.BlockSpec((None, None, BQ, Dh), lambda h, i, b: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        qp,
        k,
        v,
        biasp,
        gatep[..., None],
        kv_lens.reshape(B, 1).astype(jnp.int32),
    )
    return out[:, :, :T]


def gated_bias_attention(
    q: jnp.ndarray,  # [B, H, T, Dh], pre-scaled by Dh**-0.5
    k: jnp.ndarray,
    v: jnp.ndarray,
    pos_bias: jnp.ndarray,  # [H, T, T]
    gate: jnp.ndarray,  # [B, H, T] per-query bias scale
    kv_lens: jnp.ndarray,  # [B] valid key lengths
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused gated-bias attention; K-blocked online kernel beyond the
    whole-T VMEM budget (long audio — the pos_bias [H, T, T] streams from
    HBM in blocks; the [B, H, T, T] gated product never materializes)."""
    B, H, T, Dh = q.shape
    interpret = interpret or jax.default_backend() == "cpu"
    if T > MAX_KERNEL_T:
        return _gated_online_flash_kernel(q, k, v, pos_bias, gate, kv_lens,
                                          interpret=interpret)
    return _gated_bias_attention_kernel(q, k, v, pos_bias, gate, kv_lens, interpret=interpret)


def _fused_qkv_kernel(q_ref, k_ref, v_ref, kvlen_ref, o_ref, *,
                      num_heads: int, scale: float):
    """Grid cell = (batch, query-block); all heads computed in-cell.

    q_ref [BQ, C] / k_ref, v_ref [T, C] are block views into the SAME fused
    QKV projection output [B, T, 3C] (column offsets 0 / C / 2C), so the head
    split/transpose lives entirely in the slice indices — no [B, H, T, Dh]
    copies ever hit HBM. All heads per cell keeps the sequential Pallas grid
    short (B * T/BQ cells instead of B*H*T/BQ), which removed the
    ~10 ms/layer grid-dispatch overhead measured at B=128 on v5e; blocking
    queries bounds per-cell VMEM below the 16 MB scoped limit.
    """
    BQ = q_ref.shape[0]
    T = k_ref.shape[0]
    C = o_ref.shape[1]
    Dh = C // num_heads
    kv_len = kvlen_ref[pl.program_id(0), 0]
    # additive mask penalty computed ONCE per cell (not per head): one add
    # in the head loop instead of iota+select
    col = jax.lax.broadcasted_iota(jnp.int32, (BQ, T), 1)
    penalty = jnp.where(col < kv_len, 0.0, -1e9).astype(jnp.float32)
    for h in range(num_heads):
        # matmul operands stay in the input dtype — bf16 runs the MXU at
        # full rate while f32 operands decompose (~8x slower); accumulation
        # and the softmax are f32
        q = q_ref[:, h * Dh : (h + 1) * Dh]
        k = k_ref[:, h * Dh : (h + 1) * Dh]
        v = v_ref[:, h * Dh : (h + 1) * Dh]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + penalty  # [BQ, T]
        m = jnp.max(scores, axis=1, keepdims=True)
        p = _exp_fast(scores - m)
        recip = 1.0 / jnp.sum(p, axis=1, keepdims=True)  # [BQ, 1] divide once
        out = jax.lax.dot_general(
            (p * recip).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, h * Dh : (h + 1) * Dh] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _fused_qkv_attention_kernel(qkv, kv_lens, num_heads, interpret=False):
    B, T, C3 = qkv.shape
    C = C3 // 3
    Dh = C // num_heads
    # larger query blocks amortize grid dispatch and feed the MXU bigger
    # matmuls; 512 keeps per-cell VMEM ~12 MB under the 16 MB scoped limit
    BQ = _bq_env(512 if T <= 512 else 256)
    Tp = -(-T // BQ) * BQ
    qkvp = jnp.pad(qkv, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else qkv
    out = pl.pallas_call(
        partial(_fused_qkv_kernel, num_heads=num_heads, scale=Dh ** -0.5),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), qkv.dtype),
        grid=(B, Tp // BQ),
        in_specs=[
            # three views into the same [B, T, 3C] buffer: q rows for this
            # query block, full-length k and v columns
            pl.BlockSpec((None, BQ, C), lambda b, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Tp, C), lambda b, iq: (b, 0, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Tp, C), lambda b, iq: (b, 0, 2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kv_lens [B, 1]
        ],
        out_specs=pl.BlockSpec((None, BQ, C), lambda b, iq: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkvp, qkvp, qkvp, kv_lens.reshape(B, 1).astype(jnp.int32))
    return out[:, :T]


def fused_qkv_attention(qkv, kv_lens, num_heads: int, interpret: bool = False):
    """Masked multi-head attention straight from the fused QKV buffer.

    qkv[B, T, 3C] (unscaled), kv_lens[B] valid key counts (padding is
    contiguous). Returns [B, T, C]. Forward-only. Beyond the whole-T VMEM
    budget the K-blocked online-softmax kernel takes over.
    """
    B, T, C3 = qkv.shape
    C = C3 // 3
    if T > MAX_KERNEL_T:
        H = num_heads
        Dh = C // H
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, Dh).transpose(0, 2, 1, 3) * (Dh ** -0.5)
        k = k.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        out = online_flash_attention(q, k, v, kv_lens, interpret=interpret)
        return out.transpose(0, 2, 1, 3).reshape(B, T, C)
    interpret = interpret or jax.default_backend() == "cpu"
    return _fused_qkv_attention_kernel(qkv, kv_lens, num_heads, interpret=interpret)


def _fused_qkv_outproj_kernel(q_ref, k_ref, v_ref, r_ref, wo_ref, wos_ref,
                              bo_ref, kvlen_ref, o_ref, *, num_heads: int,
                              scale: float):
    """fused_qkv attention cell + int8 W8A8 output projection + residual.

    Extends _fused_qkv_kernel: the per-head attention outputs accumulate in
    VMEM ([BQ, C] f32), are row-quantized, hit the MXU against the int8
    out-proj weight, and the residual rides in — the raw attention output
    never exists in HBM (saves a [B, T, C] round trip per layer plus the
    separate quant/dequant passes of the XLA out-proj).
    """
    BQ = q_ref.shape[0]
    T = k_ref.shape[0]
    C = o_ref.shape[1]
    Dh = C // num_heads
    kv_len = kvlen_ref[pl.program_id(0), 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (BQ, T), 1)
    penalty = jnp.where(col < kv_len, 0.0, -1e9).astype(jnp.float32)
    heads = []
    for h in range(num_heads):
        q = q_ref[:, h * Dh : (h + 1) * Dh]
        k = k_ref[:, h * Dh : (h + 1) * Dh]
        v = v_ref[:, h * Dh : (h + 1) * Dh]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + penalty
        m = jnp.max(scores, axis=1, keepdims=True)
        p = _exp_fast(scores - m)
        recip = 1.0 / jnp.sum(p, axis=1, keepdims=True)
        heads.append(jax.lax.dot_general(
            (p * recip).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    attn = jnp.concatenate(heads, axis=1)  # [BQ, C] f32
    s = jnp.maximum(jnp.max(jnp.abs(attn), axis=1, keepdims=True), 1e-8) / 127.0
    a8 = jnp.clip(jnp.round(attn / s), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        a8, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * s * wos_ref[0, :] + bo_ref[0, :] + r_ref[:, :].astype(jnp.float32)
    o_ref[:, :] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _fused_qkv_attention_outproj_call(qkv, residual, wo_q, wo_s, bo, kv_lens,
                                      num_heads, interpret=False):
    B, T, C3 = qkv.shape
    C = C3 // 3
    Dh = C // num_heads
    # 512-row query blocks measured fastest at the serving protocol
    # (B=32, T=499); the extra residual/int8-weight buffers push a 512-row
    # cell past the 16 MB scoped-VMEM limit at larger batches, so fall back
    # to 256 rows there
    BQ = _bq_env(512 if (T <= 512 and B <= 32) else 256)
    Tp = -(-T // BQ) * BQ
    qkvp = jnp.pad(qkv, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else qkv
    resp = jnp.pad(residual, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else residual
    out = pl.pallas_call(
        partial(_fused_qkv_outproj_kernel, num_heads=num_heads, scale=Dh ** -0.5),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), qkv.dtype),
        grid=(B, Tp // BQ),
        in_specs=[
            pl.BlockSpec((None, BQ, C), lambda b, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Tp, C), lambda b, iq: (b, 0, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Tp, C), lambda b, iq: (b, 0, 2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, BQ, C), lambda b, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, iq: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, iq: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, iq: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kv_lens [B, 1]
        ],
        out_specs=pl.BlockSpec((None, BQ, C), lambda b, iq: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkvp, qkvp, qkvp, resp, wo_q, wo_s.reshape(1, C),
      bo.reshape(1, C).astype(jnp.float32), kv_lens.reshape(B, 1).astype(jnp.int32))
    return out[:, :T]


def fused_qkv_attention_outproj(qkv, residual, wo, bo, kv_lens,
                                num_heads: int, interpret: bool = False):
    """residual + out_proj(MHA(qkv)) in one kernel (int8 W8A8 out-proj).

    qkv [B, T, 3C] (unscaled fused projection), residual [B, T, C] (the
    pre-attention x), wo [C, C] / bo [C] in checkpoint dtype. Forward-only
    serving path; falls back to the unfused pair beyond the VMEM budget.
    """
    B, T, C3 = qkv.shape
    C = C3 // 3
    from ..ops.quant import as_quantized_cols, int8_matmul

    if T > MAX_KERNEL_T:
        out = fused_qkv_attention(qkv, kv_lens, num_heads, interpret=interpret)
        return residual + int8_matmul(out, wo, bo, out_dtype=residual.dtype)
    wo_q, wo_s = as_quantized_cols(wo)
    interpret = interpret or jax.default_backend() == "cpu"
    return _fused_qkv_attention_outproj_call(
        qkv, residual, wo_q, wo_s, bo, kv_lens, num_heads, interpret=interpret
    )


def _gated_outproj_kernel(q_ref, k_ref, v_ref, r_ref, bias_ref, gate_ref,
                          wo_ref, wos_ref, bo_ref, kvlen_ref, o_ref, *,
                          num_heads: int, scale: float):
    """WavLM twin of _fused_qkv_outproj_kernel: per-head attention with the
    gated rel-pos bias (scores = qk^T*scale + gate[h]*bias[h]), then the
    int8 W8A8 out-projection + residual in the same cell. The [H, BQ, T]
    gated-bias product and the raw attention output never exist in HBM.

    Grid (iq, b) — batch innermost so the [H, BQ, T] f32 bias block (an
    index function of iq only) is fetched once per query block instead of
    once per (b, iq)."""
    BQ = q_ref.shape[0]
    T = k_ref.shape[0]
    C = o_ref.shape[1]
    Dh = C // num_heads
    kv_len = kvlen_ref[pl.program_id(1), 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (BQ, T), 1)
    penalty = jnp.where(col < kv_len, 0.0, -1e9).astype(jnp.float32)
    heads = []
    for h in range(num_heads):
        q = q_ref[:, h * Dh : (h + 1) * Dh]
        k = k_ref[:, h * Dh : (h + 1) * Dh]
        v = v_ref[:, h * Dh : (h + 1) * Dh]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        gate = gate_ref[h].astype(jnp.float32)  # [BQ, 1]
        scores = scores + gate * bias_ref[h].astype(jnp.float32) + penalty
        m = jnp.max(scores, axis=1, keepdims=True)
        p = _exp_fast(scores - m)
        recip = 1.0 / jnp.sum(p, axis=1, keepdims=True)
        heads.append(jax.lax.dot_general(
            (p * recip).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    attn = jnp.concatenate(heads, axis=1)  # [BQ, C] f32
    s = jnp.maximum(jnp.max(jnp.abs(attn), axis=1, keepdims=True), 1e-8) / 127.0
    a8 = jnp.clip(jnp.round(attn / s), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        a8, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * s * wos_ref[0, :] + bo_ref[0, :] + r_ref[:, :].astype(jnp.float32)
    o_ref[:, :] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _gated_outproj_call(qkv, residual, pos_bias, gate, wo_q, wo_s, bo,
                        kv_lens, num_heads, interpret=False):
    B, T, C3 = qkv.shape
    C = C3 // 3
    H = num_heads
    Dh = C // H
    # bias block [H, BQ, T] f32 dominates VMEM (H=16: 4 MB at BQ=128,
    # 8 MB at 256); 256 fits the serving protocol (T<=512) alongside K/V
    BQ = _bq_env(256 if T <= 512 else 128)
    Tp = -(-T // BQ) * BQ
    pad_t = ((0, 0), (0, Tp - T), (0, 0))
    qkvp = jnp.pad(qkv, pad_t) if Tp != T else qkv
    resp = jnp.pad(residual, pad_t) if Tp != T else residual
    biasp = (jnp.pad(pos_bias, ((0, 0), (0, Tp - T), (0, Tp - T)))
             if Tp != T else pos_bias)
    gatep = jnp.pad(gate, ((0, 0), (0, 0), (0, Tp - T))) if Tp != T else gate
    out = pl.pallas_call(
        partial(_gated_outproj_kernel, num_heads=H, scale=Dh ** -0.5),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), qkv.dtype),
        grid=(Tp // BQ, B),  # batch innermost: bias block reused across B
        in_specs=[
            pl.BlockSpec((None, BQ, C), lambda iq, b: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Tp, C), lambda iq, b: (b, 0, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Tp, C), lambda iq, b: (b, 0, 2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, BQ, C), lambda iq, b: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, BQ, Tp), lambda iq, b: (0, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, BQ, 1), lambda iq, b: (b, 0, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda iq, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda iq, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda iq, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kv_lens [B, 1]
        ],
        out_specs=pl.BlockSpec((None, BQ, C), lambda iq, b: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkvp, qkvp, qkvp, resp, biasp.astype(jnp.float32), gatep[..., None],
      wo_q, wo_s.reshape(1, C), bo.reshape(1, C).astype(jnp.float32),
      kv_lens.reshape(B, 1).astype(jnp.int32))
    return out[:, :T]


def gated_bias_attention_outproj(qkv, residual, pos_bias, gate, wo, bo,
                                 kv_lens, num_heads: int,
                                 interpret: bool = False):
    """residual + out_proj(gated-bias MHA(qkv)) in one kernel (WavLM).

    qkv [B, T, 3C] (unscaled fused projection), residual [B, T, C],
    pos_bias [H, T, T] (shared across layers), gate [B, H, T], wo [C, C] /
    bo [C]. int8 W8A8 out-projection; forward-only serving path. Falls back
    to the split pair beyond the kernel's T budget.
    """
    B, T, C3 = qkv.shape
    C = C3 // 3
    if T > MAX_KERNEL_T:
        from ..ops.quant import int8_matmul

        H = num_heads
        Dh = C // H
        qkv_h = qkv.reshape(B, T, 3, H, Dh).transpose(0, 3, 2, 1, 4)
        out = gated_bias_attention(
            qkv_h[:, :, 0] * (Dh ** -0.5), qkv_h[:, :, 1], qkv_h[:, :, 2],
            pos_bias.astype(jnp.float32), gate.astype(jnp.float32), kv_lens,
            interpret=interpret,
        ).transpose(0, 2, 1, 3).reshape(B, T, C)
        return residual + int8_matmul(out, wo, bo, out_dtype=residual.dtype)
    from ..ops.quant import as_quantized_cols

    wo_q, wo_s = as_quantized_cols(wo)
    interpret = interpret or jax.default_backend() == "cpu"
    return _gated_outproj_call(qkv, residual, pos_bias, gate, wo_q, wo_s, bo,
                               kv_lens, num_heads, interpret=interpret)


def _attn_block_kernel(x_ref, wq_ref, bq_ref, wqs_ref, ln_ref, wo_ref,
                       wos_ref, bo_ref, kvlen_ref, inv_ref, o_ref, *,
                       num_heads: int, scale: float, static_q: bool,
                       postnorm: bool = False, int8_av: bool = False):
    """THE WHOLE pre-LN attention block in one cell (grid = (B,)):

        LN -> row-quant -> int8 QKV GEMM -> per-head attention ->
        row-quant -> int8 out-proj -> +bias -> +residual

    x makes exactly ONE HBM round trip for the entire block. The separate
    XLA LayerNorm pass, the quantize pass, the [B, T, 3C] qkv buffer, and
    the residual re-read of the unfused path (measured 1.57 ms/layer at the
    serving protocol, tools/bench_layer.py attn_only) all disappear —
    traffic drops from ~450 MB to ~70 MB per layer. Whole-T cells (T <= 512)
    so K/V are computed once; longer sequences use the split path.

    static_q: per-layer STATIC activation scales (calibrated once at qcache
    materialization, ops/quant) instead of dynamic per-row scales — the two
    per-row abs-max reduce + divide passes vanish. Isolated-kernel probe:
    0.891 vs 0.949 ms/layer (incl. the bf16 epilogue below) — but at the
    24L encoder level with real serving artifacts the delta is a measured
    WASH (tools/exp_static_act_ab.py, 52.861 vs 52.842 ms interleaved), so
    serving defaults to dynamic; S3PRL_STATIC_ACT=1 opts in. The dequant
    scale products are pre-folded into wqs/wos by the caller; inv_ref [1,2]
    SMEM carries (1/s_x, 1/s_a).
    """
    T = x_ref.shape[0]
    C = o_ref.shape[1]
    Dh = C // num_heads
    ln_g = ln_ref[0, :]
    ln_b = ln_ref[1, :]
    x_in = x_ref[...].astype(jnp.float32)  # [T, C]
    if postnorm:
        # post-LN block order (HuBERT-Base family): attention on raw x,
        # LN applied in the epilogue after the residual add
        xn = x_in
    else:
        mean = jnp.mean(x_in, axis=1, keepdims=True)
        var = jnp.mean((x_in - mean) ** 2, axis=1, keepdims=True)
        xn = (x_in - mean) * jax.lax.rsqrt(var + 1e-5) * ln_g + ln_b
    if static_q:
        x8 = jnp.clip(jnp.round(xn * inv_ref[0, 0]), -127, 127).astype(jnp.int8)
        s_x = jnp.float32(1.0)  # dequant scale folded into wqs by the caller
    else:
        s_x = jnp.maximum(jnp.max(jnp.abs(xn), axis=1, keepdims=True), 1e-8) / 127.0
        x8 = jnp.clip(jnp.round(xn / s_x), -127, 127).astype(jnp.int8)
    # dequant directly in bf16 (round-5 on-chip A/B: 0.827 vs 0.880
    # ms/layer interleaved) — the f32 intermediate + cast disappear; the
    # consumer (per-head attention math) is bf16 anyway. int32 accums carry
    # ~0.4% bf16 rounding, the same order as the int8 requant step; quality
    # pinned by the 24L HuBERT-Large cosine gate (tests/test_quant.py).
    qkv = (
        jax.lax.dot_general(
            x8, wq_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.bfloat16)
        * (s_x * wqs_ref[0, :]).astype(jnp.bfloat16)
        + bq_ref[0, :].astype(jnp.bfloat16)
    )
    kv_len = kvlen_ref[pl.program_id(0), 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    penalty = jnp.where(col < kv_len, 0.0, -1e9).astype(jnp.float32)
    if int8_av:
        # int8 PV matmul (S3PRL_INT8_AV=1, measured LOSER kept opt-in): the
        # probability matrix quantizes for FREE — softmax guarantees row
        # max(p)=1, so p8 = round(p*127) needs no abs-max pass and the row
        # dequant scale is just recip/127. V quantizes per-column ONCE per
        # cell. The PV contraction is T (MXU-deep, unlike the K=Dh=64 QK
        # side) — the one SDPA matmul where the int8 rate is reachable —
        # but the on-chip interleaved A/B at the serving protocol reads
        # −1.1 to −1.4% end to end (4,868–4,882 off vs 4,811–4,814 on):
        # the V-quant + p-round + two-scale dequant VPU passes cost more
        # than the halved MXU time at N=64. Numerics vs the default int8
        # path: cosine 0.999997 (interpret-mode check in tests).
        vblk = qkv[:, 2 * C :].astype(jnp.float32)  # [T, C]
        s_v = jnp.maximum(
            jnp.max(jnp.abs(vblk), axis=0, keepdims=True), 1e-8) / 127.0
        v8 = jnp.clip(jnp.round(vblk / s_v), -127, 127).astype(jnp.int8)
    heads = []
    for h in range(num_heads):
        q = qkv[:, h * Dh : (h + 1) * Dh]
        k = qkv[:, C + h * Dh : C + (h + 1) * Dh]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + penalty
        m = jnp.max(scores, axis=1, keepdims=True)
        p = _exp_fast(scores - m)
        recip = 1.0 / jnp.sum(p, axis=1, keepdims=True)
        if int8_av:
            p8 = jnp.round(p * 127.0).astype(jnp.int8)  # p in [0,1]: no clip
            out = jax.lax.dot_general(
                p8, v8[:, h * Dh : (h + 1) * Dh], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (recip * (1.0 / 127.0)) \
                * s_v[:, h * Dh : (h + 1) * Dh]
            heads.append(out.astype(jnp.bfloat16))
        else:
            v = qkv[:, 2 * C + h * Dh : 2 * C + (h + 1) * Dh]
            heads.append(jax.lax.dot_general(
                (p * recip).astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16))
    attn = jnp.concatenate(heads, axis=1)  # [T, C] bf16
    if static_q:
        # Mosaic has no bf16 roundeven; the round itself upcasts
        a8 = jnp.clip(jnp.round((attn * inv_ref[0, 1].astype(jnp.bfloat16))
                                .astype(jnp.float32)),
                      -127, 127).astype(jnp.int8)
        # bf16 epilogue (round-5 A/B: −0.02 ms/layer): dequant + bias +
        # residual against the raw bf16 x — o_ref is bf16 anyway, and the
        # dequant scale is pre-folded into wos
        y = (jax.lax.dot_general(
            a8, wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.bfloat16)
            * wos_ref[0, :].astype(jnp.bfloat16)
            + bo_ref[0, :].astype(jnp.bfloat16) + x_ref[...])
        o_ref[...] = y.astype(o_ref.dtype)
    else:
        s_a = (
            jnp.maximum(jnp.max(jnp.abs(attn), axis=1, keepdims=True),
                        jnp.bfloat16(1e-6)) / jnp.bfloat16(127.0)
        )
        # Mosaic has no bf16 roundeven; the round itself upcasts
        a8 = jnp.clip(jnp.round((attn / s_a).astype(jnp.float32)),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            a8, wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        y = y * s_a.astype(jnp.float32) * wos_ref[0, :] + bo_ref[0, :] + x_in
        if postnorm:
            mean = jnp.mean(y, axis=1, keepdims=True)
            var = jnp.mean((y - mean) ** 2, axis=1, keepdims=True)
            y = (y - mean) * jax.lax.rsqrt(var + 1e-5) * ln_g + ln_b
        o_ref[...] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("num_heads", "static_q", "postnorm",
                                   "int8_av", "interpret"))
def _attn_block_call(x, wq_q, wq_s, bq, ln2, wo_q, wo_s, bo, kv_lens,
                     inv_scales, num_heads, static_q=False, postnorm=False,
                     int8_av=False, interpret=False):
    B, T, C = x.shape
    Dh = C // num_heads
    Tp = -(-T // 128) * 128
    xp = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else x
    out = pl.pallas_call(
        partial(_attn_block_kernel, num_heads=num_heads, scale=Dh ** -0.5,
                static_q=static_q, postnorm=postnorm, int8_av=int8_av),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, Tp, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kv_lens [B, 1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inv_scales [1, 2]
        ],
        out_specs=pl.BlockSpec((None, Tp, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, wq_q, bq.reshape(1, 3 * C).astype(jnp.float32), wq_s.reshape(1, 3 * C),
      ln2, wo_q, wo_s.reshape(1, C), bo.reshape(1, C).astype(jnp.float32),
      kv_lens.reshape(B, 1).astype(jnp.int32),
      inv_scales.reshape(1, 2).astype(jnp.float32))
    return out[:, :T]


MAX_BLOCK_T = 512  # whole-T attention-block cells; beyond -> split path


def fused_attention_block(x, wq, bq, ln, wo, bo, kv_lens, num_heads: int,
                          act_scales=None, postnorm: bool = False,
                          interpret: bool = False):
    """residual + out_proj(MHA(qkv_proj(LN(x)))) — the full pre-LN attention
    block in one Pallas kernel (int8 W8A8 projections). `ln` =
    (scale[C], bias[C]); wq [C, 3C], wo [C, C] in checkpoint dtype.
    Sequences beyond MAX_BLOCK_T fall back to the LN -> int8 qkv -> fused
    attention+out-proj split path. ``postnorm=True`` flips to the post-LN
    block order LN(x + out_proj(MHA(qkv_proj(x)))) (HuBERT-Base family);
    static act_scales are a pre-LN-only opt-in.

    act_scales: optional [2] array (s_x, s_a) of per-layer STATIC activation
    scales (calibrated at qcache materialization) — replaces the dynamic
    per-row scales; the dequant products fold into the weight scales here
    (one [3C]+[C] elementwise multiply, fused by XLA into the surrounding
    graph) so the kernel's epilogues carry no per-row scale vectors.
    """
    from ..ops.quant import as_quantized_cols

    assert not (postnorm and act_scales is not None)
    B, T, C = x.shape
    ln2 = jnp.stack([ln[0].astype(jnp.float32), ln[1].astype(jnp.float32)])
    wq_q, wq_s = as_quantized_cols(wq)
    wo_q, wo_s = as_quantized_cols(wo)
    if act_scales is not None:
        wq_s = wq_s * act_scales[0]
        wo_s = wo_s * act_scales[1]
        inv_scales = 1.0 / act_scales
    else:
        inv_scales = jnp.ones((2,), jnp.float32)
    interpret = interpret or jax.default_backend() == "cpu"
    # S3PRL_INT8_AV=1: int8 PV matmul inside the SDPA (see the kernel
    # comment) — opt-in pending the on-chip A/B + quality gate
    int8_av = os.environ.get("S3PRL_INT8_AV", "0") == "1"
    return _attn_block_call(x, wq_q, wq_s, bq, ln2, wo_q, wo_s, bo, kv_lens,
                            inv_scales, num_heads,
                            static_q=act_scales is not None,
                            postnorm=postnorm, int8_av=int8_av,
                            interpret=interpret)


def _attn_block_bf16_kernel(x_ref, wq_ref, bq_ref, ln_ref, wo_ref, bo_ref,
                            kvlen_ref, o_ref, *, num_heads: int,
                            scale: float, postnorm: bool = False):
    """bf16 twin of _attn_block_kernel: the whole pre-LN attention block
    (LN -> bf16 QKV GEMM -> per-head attention -> bf16 out-proj ->
    +residual) in one cell, grid = (B,). Same traffic argument as the int8
    kernel: the qkv tensor, the attention output, and the LN output never
    round-trip HBM. LN statistics in f32 (matches nn.LayerNorm exactly);
    GEMMs bf16 with f32 accumulation — the same precision contract as the
    XLA path it replaces (reference bf16 serving)."""
    T = x_ref.shape[0]
    C = o_ref.shape[1]
    Dh = C // num_heads
    x_in = x_ref[...].astype(jnp.float32)  # [T, C]
    ln_g = ln_ref[0, :]
    ln_b = ln_ref[1, :]
    if postnorm:  # post-LN block order: LN moves to the epilogue
        xn = x_in
    else:
        mean = jnp.mean(x_in, axis=1, keepdims=True)
        var = jnp.mean((x_in - mean) ** 2, axis=1, keepdims=True)
        xn = (x_in - mean) * jax.lax.rsqrt(var + 1e-5) * ln_g + ln_b
    qkv = (
        jax.lax.dot_general(
            xn.astype(jnp.bfloat16), wq_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bq_ref[0, :]
    ).astype(jnp.bfloat16)
    kv_len = kvlen_ref[pl.program_id(0), 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    penalty = jnp.where(col < kv_len, 0.0, -1e9).astype(jnp.float32)
    heads = []
    for h in range(num_heads):
        q = qkv[:, h * Dh : (h + 1) * Dh]
        k = qkv[:, C + h * Dh : C + (h + 1) * Dh]
        v = qkv[:, 2 * C + h * Dh : 2 * C + (h + 1) * Dh]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + penalty
        m = jnp.max(scores, axis=1, keepdims=True)
        p = _exp_fast(scores - m)
        recip = 1.0 / jnp.sum(p, axis=1, keepdims=True)
        heads.append(jax.lax.dot_general(
            (p * recip).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16))
    attn = jnp.concatenate(heads, axis=1)  # [T, C] bf16
    y = (
        jax.lax.dot_general(
            attn, wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[0, :] + x_in
    )
    if postnorm:
        mean = jnp.mean(y, axis=1, keepdims=True)
        var = jnp.mean((y - mean) ** 2, axis=1, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + 1e-5) * ln_g + ln_b
    o_ref[...] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("num_heads", "postnorm", "interpret"))
def _attn_block_bf16_call(x, wq, bq, ln2, wo, bo, kv_lens, num_heads,
                          postnorm=False, interpret=False):
    B, T, C = x.shape
    Dh = C // num_heads
    Tp = -(-T // 128) * 128
    xp = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else x
    out = pl.pallas_call(
        partial(_attn_block_bf16_kernel, num_heads=num_heads,
                scale=Dh ** -0.5, postnorm=postnorm),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, Tp, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kv_lens [B, 1]
        ],
        out_specs=pl.BlockSpec((None, Tp, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, wq.astype(jnp.bfloat16),
      bq.reshape(1, 3 * C).astype(jnp.float32), ln2,
      wo.astype(jnp.bfloat16), bo.reshape(1, C).astype(jnp.float32),
      kv_lens.reshape(B, 1).astype(jnp.int32))
    return out[:, :T]


def fused_attention_block_bf16(x, wq, bq, ln, wo, bo, kv_lens,
                               num_heads: int, postnorm: bool = False,
                               interpret: bool = False):
    """residual + out_proj(MHA(qkv_proj(LN(x)))) in one Pallas kernel with
    bf16 weights — the reference-precision (quantize=False) serving twin of
    fused_attention_block. `ln` = (scale[C], bias[C]); wq [C, 3C], wo [C, C]
    in checkpoint dtype (cast to bf16 here, resident in VMEM: 6+2 MB at
    C=1024). Sequences beyond MAX_BLOCK_T fall back to the caller's split
    path (XLA LN/QKV + fused_qkv_attention + XLA out-proj). ``postnorm=True``
    flips to the post-LN block order LN(x + out_proj(MHA(qkv_proj(x))))
    (HuBERT-Base family, fairseq layer_norm_first=False)."""
    ln2 = jnp.stack([ln[0].astype(jnp.float32), ln[1].astype(jnp.float32)])
    interpret = interpret or jax.default_backend() == "cpu"
    return _attn_block_bf16_call(x, wq, bq, ln2, wo, bo, kv_lens, num_heads,
                                 postnorm=postnorm, interpret=interpret)


def _online_kernel(q_ref, k_ref, v_ref, kvlen_ref, o_ref, m_ref, l_ref,
                   acc_ref, *, nk: int, bk: int):
    """K-blocked online-softmax cell: grid (B, H, nQ, nK), the K dimension
    innermost. Scratch (m, l, acc) persists across the K iterations of one
    (b, h, iq) triple; double buffering of the K/V block DMAs comes from the
    standard Pallas pipeline. Handles T beyond the whole-T kernels' VMEM
    budget (long-audio serving).
    """
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...].astype(jnp.float32)  # [BQ, Dh] (pre-scaled)
    k = k_ref[...].astype(jnp.float32)  # [BK, Dh]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    kv_len = kvlen_ref[pl.program_id(0), 0]
    col = ik * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, -1e30)

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = _exp_fast(m_prev - m_new)
    p = _exp_fast(s - m_new)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = m_new

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[...] = (
            acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
        ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _online_flash_kernel(q, k, v, kv_lens, interpret=False):
    B, H, T, Dh = q.shape
    BQ, BK = 512, 1024
    Tq = -(-T // BQ) * BQ
    Tk = -(-T // BK) * BK
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tq - T), (0, 0))) if Tq != T else q
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Tk - T), (0, 0))) if Tk != T else k
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Tk - T), (0, 0))) if Tk != T else v
    nk = Tk // BK
    out = pl.pallas_call(
        partial(_online_kernel, nk=nk, bk=BK),
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, Dh), q.dtype),
        grid=(B, H, Tq // BQ, nk),
        in_specs=[
            pl.BlockSpec((None, None, BQ, Dh), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, BK, Dh), lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, BK, Dh), lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kv_lens [B, 1]
        ],
        out_specs=pl.BlockSpec((None, None, BQ, Dh), lambda b, h, i, j: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BQ, 1), jnp.float32),   # running max
            pltpu.VMEM((BQ, 1), jnp.float32),   # running denominator
            pltpu.VMEM((BQ, Dh), jnp.float32),  # output accumulator
        ],
        interpret=interpret,
    )(qp, kp, vp, kv_lens.reshape(B, 1).astype(jnp.int32))
    return out[:, :, :T]


def online_flash_attention(q, k, v, kv_lens, interpret: bool = False):
    """K-blocked online-softmax attention for sequences beyond the whole-T
    kernels' VMEM budget. q pre-scaled by Dh**-0.5; kv_lens[B] valid key
    counts (contiguous padding). Forward-only.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    return _online_flash_kernel(q, k, v, kv_lens, interpret=interpret)


def _gated_online_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, kvlen_ref,
                         o_ref, m_ref, l_ref, acc_ref, *, nk: int, bk: int):
    """Gated-bias twin of _online_kernel (long-audio WavLM serving):
    scores = q k^T + gate[b,h,i] * pos_bias[h,i,j], K-blocked online
    softmax. pos_bias [H, T, T] STREAMS from HBM in [BQ, BK] blocks via the
    grid index map — the [B, H, T, T] gated product (4x pos_bias, x B) that
    the XLA fallback materializes never exists anywhere; scores never leave
    VMEM. HBM bias traffic is B*H*T^2*4 bytes per layer (0.6 GB at B=4,
    60 s), ~1 ms at the measured stream rate — immaterial next to the
    attention FLOPs at those shapes."""
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...].astype(jnp.float32)  # [BQ, Dh] (pre-scaled)
    k = k_ref[...].astype(jnp.float32)  # [BK, Dh]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    gate = gate_ref[...].astype(jnp.float32).reshape(-1, 1)  # [BQ, 1]
    s = s + gate * bias_ref[...].astype(jnp.float32)
    kv_len = kvlen_ref[pl.program_id(0), 0]
    col = ik * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, -1e30)

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = _exp_fast(m_prev - m_new)
    p = _exp_fast(s - m_new)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = m_new

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[...] = (
            acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
        ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _gated_online_flash_kernel(q, k, v, pos_bias, gate, kv_lens,
                               interpret=False):
    B, H, T, Dh = q.shape
    BQ, BK = 512, 1024
    Tq = -(-T // BQ) * BQ
    Tk = -(-T // BK) * BK
    pad_q, pad_k = Tq - T, Tk - T
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0))) if pad_q else q
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0))) if pad_k else k
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0))) if pad_k else v
    biasp = (jnp.pad(pos_bias, ((0, 0), (0, pad_q), (0, pad_k)))
             if (pad_q or pad_k) else pos_bias)
    gatep = jnp.pad(gate, ((0, 0), (0, 0), (0, pad_q))) if pad_q else gate
    nk = Tk // BK
    out = pl.pallas_call(
        partial(_gated_online_kernel, nk=nk, bk=BK),
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, Dh), q.dtype),
        grid=(B, H, Tq // BQ, nk),
        in_specs=[
            pl.BlockSpec((None, None, BQ, Dh), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, BK, Dh), lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, BK, Dh), lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, BQ, BK), lambda b, h, i, j: (h, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, BQ, 1), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kv_lens [B, 1]
        ],
        out_specs=pl.BlockSpec((None, None, BQ, Dh),
                               lambda b, h, i, j: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BQ, 1), jnp.float32),   # running max
            pltpu.VMEM((BQ, 1), jnp.float32),   # running denominator
            pltpu.VMEM((BQ, Dh), jnp.float32),  # output accumulator
        ],
        interpret=interpret,
    )(qp, kp, vp, biasp.astype(jnp.float32), gatep[..., None],
      kv_lens.reshape(B, 1).astype(jnp.int32))
    return out[:, :, :T]


def _attn_kernel_nobias(q_ref, k_ref, v_ref, kvlen_ref, o_ref):
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    T = scores.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (scores.shape[0], T), 1)
    kv_len = kvlen_ref[pl.program_id(0), 0]
    scores = jnp.where(col < kv_len, scores, -1e9)
    m = jnp.max(scores, axis=1, keepdims=True)
    p = _exp_fast(scores - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    out = jax.lax.dot_general(
        p, v_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (out / denom).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _flash_attention_kernel(q, k, v, kv_lens, interpret=False):
    B, H, T, Dh = q.shape
    BQ = _query_block(T)
    Tp = -(-T // BQ) * BQ
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0))) if Tp != T else q
    out = pl.pallas_call(
        _attn_kernel_nobias,
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, Dh), q.dtype),
        grid=(B, H, Tp // BQ),
        in_specs=[
            pl.BlockSpec((None, None, BQ, Dh), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, T, Dh), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, T, Dh), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kv_lens [B,1], whole array
        ],
        out_specs=pl.BlockSpec((None, None, BQ, Dh), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, k, v, kv_lens.reshape(B, 1).astype(jnp.int32))
    return out[:, :, :T]


def flash_attention(q, k, v, kv_lens, interpret: bool = False):
    """Fused masked attention (no bias): scores never touch HBM.

    q pre-scaled by Dh**-0.5; kv_lens[B] valid key counts (padding is
    contiguous in this framework). Forward-only (use under stop_gradient /
    inference; training falls back to the XLA path).
    """
    B, H, T, Dh = q.shape
    if T > MAX_KERNEL_T:
        return online_flash_attention(q, k, v, kv_lens, interpret=interpret)
    interpret = interpret or jax.default_backend() == "cpu"
    return _flash_attention_kernel(q, k, v, kv_lens, interpret=interpret)
