"""Dynamic int8 quantized matmul path (W8A8) for the serving/extraction mode.

The v5e MXU runs int8xint8->int32 at twice the bf16 rate; for the
extraction-dominated workloads (SUPERB feature probing, bench.py) the dense
GEMMs are the FLOP majority, so an opt-in quantized path roughly doubles the
achievable throughput ceiling. Scheme:

- weights: symmetric per-output-channel scales, quantized from the loaded
  (bf16/f32) checkpoint values inside the jitted forward — XLA folds the
  quantization of constants, so there is no separate calibration step and
  checkpoints stay in their original dtype;
- activations: symmetric dynamic per-token (per-row) scales computed on the
  fly (absmax / 127);
- accumulation in int32, dequantize = int32 * row_scale * col_scale, bias
  added in float.

This is inference-only (no straight-through estimator); training paths keep
bf16/f32. Quality is validated by tests/test_quant.py: hidden-state cosine
similarity vs the bf16 path stays >0.999 on random trunks.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray):
    """Symmetric per-row int8: [.., K] -> (int8 values, [.., 1] f32 scales)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_cols(w: jnp.ndarray):
    """Symmetric per-output-channel int8: [K, N] -> (int8, [N] f32 scales)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


QCACHE = "qcache"  # flax collection holding pre-quantized serving weights


def cached_quantize_cols(mod: nn.Module, name: str, w: jnp.ndarray):
    """quantize_cols(w), served from the ``qcache`` variable collection.

    Weight quantization is NOT free at serving time: XLA does not hoist it
    out of the per-call forward (measured +0.12 ms/layer on the attention
    block alone at the bench protocol — the abs-max/divide/round passes over
    every projection matrix re-ran on every forward). Factories materialize
    the collection once at load time (`model.apply(..., mutable=["qcache"])`)
    and thread it through every subsequent apply; when the collection is
    absent (training, one-off CPU tests, user-supplied param trees) this
    falls back to inline quantization — numerics are identical either way.
    """
    if mod.has_variable(QCACHE, name) or mod.is_mutable_collection(QCACHE):
        v = mod.variable(
            QCACHE, name,
            lambda: quantize_cols(jax.lax.stop_gradient(w)),
        )
        return v.value
    return quantize_cols(w)


def as_quantized_cols(w):
    """Normalize a weight argument that may already be a (int8, scales)
    pair (from the qcache) to the pair form."""
    if isinstance(w, (tuple, list)):
        wq, ws = w
        return wq, ws
    return quantize_cols(w)


def int8_matmul(x: jnp.ndarray, kernel, bias=None, out_dtype=None):
    """x [.., K] @ kernel [K, N] via dynamic W8A8 with int32 accumulation.

    `kernel` may be the raw [K, N] weights or a pre-quantized
    (int8 values, per-col scales) pair from the qcache.
    """
    out_dtype = out_dtype or x.dtype
    xq, xs = quantize_rows(x)
    wq, ws = as_quantized_cols(kernel)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * xs * ws
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in for nn.Dense with identical param names/shapes ("kernel",
    "bias" in the checkpoint dtype), quantizing at apply time."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), self.param_dtype,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
            if self.use_bias else None
        )
        return int8_matmul(x, cached_quantize_cols(self, "kernel_q8", kernel),
                           bias, out_dtype=self.dtype)


def dense(features: int, *, quantize: bool = False, dtype=jnp.float32,
          use_bias: bool = True, name: str = None) -> nn.Module:
    """nn.Dense or its int8 twin behind one switch (same param tree)."""
    if quantize:
        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def int8_conv1d_valid(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                      out_dtype=None) -> jnp.ndarray:
    """Valid strided 1-D conv as per-tap W8A8 matmuls (serving path).

    x [B, T, Cin], kernel [k, Cin, Cout] (nn.Conv layout). Each tap t is a
    strided row view x[:, t::stride][:T_out] feeding one int8 GEMM; the
    int32 accumulators are dequantized per (row, tap) and summed in f32.
    Activation rows are quantized ONCE (per input row) and every tap slices
    the same int8 buffer, so quantization traffic is 1x the input.
    """
    out_dtype = out_dtype or x.dtype
    B, T, Cin = x.shape
    k, _, Cout = kernel.shape
    T_out = (T - k) // stride + 1
    xq, xs = quantize_rows(x)  # [B, T, Cin] int8, [B, T, 1] f32
    acc = None
    for t in range(k):
        tap = jax.lax.slice(xq, (0, t, 0), (B, t + stride * (T_out - 1) + 1, Cin),
                            (1, stride, 1))
        ts = jax.lax.slice(xs, (0, t, 0), (B, t + stride * (T_out - 1) + 1, 1),
                           (1, stride, 1))
        wq, ws = quantize_cols(kernel[t])
        y = jax.lax.dot_general(
            tap, wq, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * ts * ws
        acc = y if acc is None else acc + y
    return acc.astype(out_dtype)


class LinearParams(nn.Module):
    """Registers nn.Dense-shaped params ("kernel", "bias") and returns them
    raw — for fused kernels that consume weights directly while keeping the
    checkpoint param tree identical to nn.Dense."""

    in_features: int
    out_features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.out_features), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (self.out_features,),
                       self.param_dtype)
        return k, b


class NormParams(nn.Module):
    """nn.LayerNorm's 'scale'/'bias' params, compute handled by a fused
    kernel (kernels/ffn.py) — param tree identical to nn.LayerNorm."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias
