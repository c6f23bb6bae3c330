"""Pallas TPU kernel: fused row LayerNorm + GELU (bf16 I/O, fp32 stats).

The conv front end (models/convfe.py; reference ConvFeatureExtractionModel,
s3prl/upstream/wav2vec2/wav2vec2_model.py:2857-2933) follows every mid conv
with Fp32LayerNorm + GELU over [B, T_i, 512]. XLA's lowering of that pair
measures ~194 GB/s effective on v5e (tools/bench_hbm.py ln_gelu case) while
a plain read+write pass sustains ~793 GB/s — the fp32 widening and separate
reduction/normalize passes quadruple the traffic on tensors that total ~2 GB
per forward at the serving protocol (B=32, 10 s).

This kernel does ONE bf16 read and ONE bf16 write per element: each grid
cell loads a [BR, C] row block, computes per-row mean/var in fp32 in VMEM,
applies scale/bias and exact-or-tanh GELU, and writes bf16. The conv itself
stays on XLA's lowering (which beats every hand tiling measured —
PARITY.md round 3); only the memory-bound epilogue moves to Pallas.

Serving-only (forward). Training uses the differentiable XLA path.

MEASURED OUTCOME (round 4, on-chip A/B): standalone the XLA pair is 4x off
copy rate, but in the FULL conv-front-end graph XLA fuses LN+GELU into the
surrounding convolution ops, and inserting this kernel boundary makes the
end-to-end path SLOWER (3,489 vs 4,423 audio-sec/s). Opt-in via
S3PRL_MIDLN=pallas for re-measurement on future compiler versions; the
serving default stays on the XLA lowering (models/convfe.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_frontend import _ln_gelu

BR = 1024  # rows per grid cell ([BR, 512] bf16 = 1 MB block)


def _kernel(x_ref, g_ref, b_ref, o_ref, *, gelu_mode):
    y = _ln_gelu(x_ref[...].astype(jnp.float32), g_ref, b_ref, gelu_mode)
    o_ref[...] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret", "gelu_mode"))
def ln_gelu(x, scale, bias, interpret: bool = False, gelu_mode: str = None):
    """GELU(LayerNorm(x)) over the last axis; x [..., C], fp32 statistics
    (eps 1e-5), numerics matching nn.LayerNorm + nn.gelu exactly (erf) or
    to ~3e-3 (tanh serving mode)."""
    shape = x.shape
    C = shape[-1]
    rows = 1
    for d in shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, C)
    Rp = -(-rows // BR) * BR
    if Rp != rows:
        x2 = jnp.pad(x2, ((0, Rp - rows), (0, 0)))
    out = pl.pallas_call(
        partial(_kernel, gelu_mode=gelu_mode),
        out_shape=jax.ShapeDtypeStruct((Rp, C), x.dtype),
        grid=(Rp // BR,),
        in_specs=[
            pl.BlockSpec((BR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, scale.reshape(1, C).astype(jnp.float32),
      bias.reshape(1, C).astype(jnp.float32))
    return out[:rows].reshape(shape)
