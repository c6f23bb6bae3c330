"""Strided conv waveform feature extractor (wav2vec2/HuBERT front-end).

Behavioral spec from the reference's ConvFeatureExtractionModel
(s3prl/upstream/wav2vec2/wav2vec2_model.py:2857-2933): a stack of unpadded
strided 1-D convs over raw 16 kHz waveform with
- mode="default": per-channel GroupNorm (groups == channels) after the first
  conv only (wav2vec2-Base / HuBERT-Base), or
- mode="layer_norm": channel LayerNorm after every conv (the *-Large models),
followed by exact (erf) GELU.

TPU-first design notes: channels-last [B, T, C] layout throughout so XLA maps
the convs onto the MXU as im2col matmuls; norms run in fp32 regardless of the
compute dtype (matching the reference's Fp32GroupNorm/Fp32LayerNorm).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.masking import lengths_after_conv1d

# (dim, kernel, stride) stack shared by wav2vec2/HuBERT: total stride 320,
# receptive field 400 samples.
DEFAULT_CONV_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 2, 2),
    (512, 2, 2),
)


def conv_output_lengths(wav_lens, conv_layers=DEFAULT_CONV_LAYERS):
    lens = wav_lens
    for _, k, s in conv_layers:
        lens = lengths_after_conv1d(lens, k, s)
    return lens


def total_stride(conv_layers=DEFAULT_CONV_LAYERS) -> int:
    out = 1
    for _, _, s in conv_layers:
        out *= s
    return out


class _Im2ColConv(nn.Module):
    """Valid strided conv over a single input channel as an im2col matmul.

    Mathematically identical to nn.Conv(features, (k,), (stride,), 'VALID')
    on [B, T, 1] input — parameter path ('kernel' [k, 1, features], fp32) and
    numerics match; only the lowering differs (strided patch extraction +
    one dense [B*T', k] @ [k, features] MXU matmul instead of a C_in=1 conv).
    """

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, 1]
        import jax

        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, 1, self.features), jnp.float32
        )
        patches = jax.lax.conv_general_dilated_patches(
            jnp.transpose(x, (0, 2, 1)),  # [B, 1, T]
            filter_shape=(k,),
            window_strides=(self.stride,),
            padding="VALID",
        )  # [B, k, T']
        out = jnp.einsum(
            "bkt,kf->btf",
            patches.astype(self.dtype),
            kernel[:, 0, :].astype(self.dtype),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


class _Im2ColConvGeneral(nn.Module):
    """Valid strided conv as patches + one MXU matmul, any C_in.

    Parameter path/shape identical to nn.Conv ('kernel' [k, in, out], fp32);
    only the lowering differs — the strided patch extraction feeds a single
    dense [B*T', in*k] @ [in*k, out] GEMM, which the MXU sustains at a much
    higher rate than XLA's strided-conv lowering for this k=2/3 C=512 shape.
    """

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        import jax

        k, cin = self.kernel_size, x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, cin, self.features), jnp.float32
        )
        patches = jax.lax.conv_general_dilated_patches(
            jnp.transpose(x, (0, 2, 1)),  # [B, C, T]
            filter_shape=(k,),
            window_strides=(self.stride,),
            padding="VALID",
        )  # [B, C*k, T'] with the channel axis ordered (C major, k minor)
        w = kernel.transpose(1, 0, 2).reshape(cin * k, self.features)
        out = jnp.einsum(
            "bft,fo->bto", patches.astype(self.dtype), w.astype(self.dtype)
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


class _ParamOnly(nn.Module):
    """Declares nn.Conv's 'kernel' param without binding compute — used when
    the fused Pallas front-end kernel consumes the weights directly."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32)


class _NormParams(nn.Module):
    """nn.LayerNorm's 'scale'/'bias' params, compute handled by the kernel."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class _Int8MidConv(nn.Module):
    """Valid strided conv as per-tap W8A8 int8 GEMMs (ops/quant.py
    int8_conv1d_valid). Param path/shape identical to nn.Conv; serving only
    (not differentiable through the round)."""

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        from ..ops.quant import int8_conv1d_valid

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, x.shape[-1], self.features), jnp.float32,
        )
        out = int8_conv1d_valid(x, kernel, self.stride, out_dtype=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


class ConvFeatureExtractor(nn.Module):
    conv_layers: Sequence[Tuple[int, int, int]] = DEFAULT_CONV_LAYERS
    mode: str = "default"  # "default" | "layer_norm"
    conv_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    impl: str = "conv"  # "conv" (XLA conv) | "im2col" (patch GEMMs) | "int8"
    quantize: bool = False  # accepted for config symmetry; conv layers keep
    # bf16 even in quantized serving (int8 convs measured slower on-chip)

    @nn.compact
    def __call__(self, wavs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """wavs[B, T] -> features[B, T', C] (valid conv, total stride 320).

        `train=True` routes layer 0 through the differentiable XLA path (the
        fused Pallas kernel is forward-only); extraction keeps the kernel.
        """
        assert self.mode in ("default", "layer_norm")
        import jax

        x = wavs[..., None].astype(self.dtype)  # [B, T, 1]
        dim0, k0, s0 = self.conv_layers[0]
        fuse0 = (
            self.mode == "layer_norm" and not self.conv_bias and k0 == 2 * s0
            and not train
        )
        import os

        chainable = all(k in (2, 3) and s == 2 for _, k, s in self.conv_layers[1:])
        chain_int8 = (
            fuse0 and self.quantize
            and os.environ.get("S3PRL_INT8_CONV", "0") == "1"
            and chainable
        )
        chain_bf16 = (
            fuse0 and chainable and not chain_int8
            and os.environ.get("S3PRL_FUSED_CONV", "0") == "1"
        )
        if chain_bf16:
            # bf16 fused mid layers (conv+LN+GELU one pass) — A/B via
            # S3PRL_FUSED_CONV=1. MEASURED SLOWER than XLA's conv lowering
            # on the tunnel chip (58.0 vs 26.8 ms front end): the per-tap
            # [CH,512]x[512,512] GEMMs underutilize the MXU vs XLA's
            # multi-level conv tiling. Kept for A/B on other hardware.
            from ..kernels.conv_frontend import conv0_ln_gelu, fused_conv_ln_gelu

            interp = jax.default_backend() == "cpu"
            kernel = _ParamOnly((k0, 1, dim0), name="conv_0")()
            g, b = _NormParams(dim0, name="ln_0")()
            x = conv0_ln_gelu(wavs.astype(self.dtype), kernel, g, b,
                              stride=s0, k=k0, interpret=interp)
            cin = dim0
            for i, (dim, k, stride) in enumerate(self.conv_layers):
                if i == 0:
                    continue
                ki = _ParamOnly((k, cin, dim), name=f"conv_{i}")()
                gi, bi = _NormParams(dim, name=f"ln_{i}")()
                x = fused_conv_ln_gelu(x, ki, gi, bi, interpret=interp)
                cin = dim
            return x
        if chain_int8:
            # int8 conv chain: every inter-layer activation lives in HBM as
            # (int8 rows + f32 row scales) with conv+LN+GELU+requant fused
            # per layer (kernels/conv_frontend.py). MEASURED SLOWER than the
            # XLA bf16 convs on the axon tunnel chip (47.7 vs 26.8 ms — the
            # int8 MXU rate at K=N=512 does not beat bf16 there, and the
            # requant VPU passes add up), so opt-in via S3PRL_INT8_CONV=1
            # for A/B on other hardware. Serving only.
            from ..kernels.conv_frontend import (
                conv0_ln_gelu_q8, fused_int8_conv_ln_gelu)

            interp = jax.default_backend() == "cpu"
            kernel = _ParamOnly((k0, 1, dim0), name="conv_0")()
            g, b = _NormParams(dim0, name="ln_0")()
            xq, xs = conv0_ln_gelu_q8(
                wavs.astype(self.dtype), kernel, g, b, stride=s0, k=k0,
                interpret=interp,
            )
            last = len(self.conv_layers) - 1
            for i, (dim, k, stride) in enumerate(self.conv_layers):
                if i == 0:
                    cin = dim
                    continue
                ki = _ParamOnly((k, cin, dim), name=f"conv_{i}")()
                gi, bi = _NormParams(dim, name=f"ln_{i}")()
                xq, xs = fused_int8_conv_ln_gelu(
                    xq, xs, ki, gi, bi, emit_q8=(i != last),
                    out_dtype=self.dtype, interpret=interp,
                )
                cin = dim
            return xq
        # int8 serving runs the tanh-approximate GELU (torch approximate=
        # 'tanh'; max abs err ~3e-3, below the int8 requant step — gated by
        # tests/test_quant.py Large-scale cosine): XLA's erf costs 7.7 ms of
        # the 27.7 ms front end on v5e (tools/bench_conv_act probe). The
        # bf16 path keeps exact erf (reference precision).
        serving_tanh = self.quantize and not train
        if fuse0:
            # fused conv0+LN+GELU Pallas kernel: the layer-0 output is the
            # biggest tensor of the pipeline and XLA's lowering round-trips
            # it through HBM several times (kernels/conv_frontend.py). Param
            # paths stay identical to the unfused modules.
            from ..kernels.conv_frontend import conv0_ln_gelu

            kernel = _ParamOnly((k0, 1, dim0), name="conv_0")()
            scale, bias = _NormParams(dim0, name="ln_0")()
            x = conv0_ln_gelu(
                wavs.astype(self.dtype), kernel, scale, bias, stride=s0, k=k0,
                interpret=jax.default_backend() == "cpu",
                gelu_mode="tanh" if serving_tanh else None,
            )
        for i, (dim, k, stride) in enumerate(self.conv_layers):
            if i == 0 and fuse0:
                continue  # handled by the fused kernel above
            # S3PRL_CONV_IMPL overrides the mid-conv lowering for on-chip
            # A/B (conv | im2col | int8) without re-constructing the model
            impl = os.environ.get("S3PRL_CONV_IMPL") or self.impl
            if i == 0:
                # the C_in=1 waveform conv lowers poorly onto the MXU;
                # _Im2ColConv computes the identical op as a patches matmul
                # (same param path/shape as nn.Conv for ckpt compatibility)
                x = _Im2ColConv(dim, k, stride, self.conv_bias, self.dtype, name="conv_0")(x)
            elif impl == "int8" and not train:
                # measured SLOWER than the XLA bf16 conv on the axon tunnel
                # chip (full path 131 ms vs 98 ms, tools/bench_components.py)
                # — selectable for real-v5e runs, not routed by `quantize`
                x = _Int8MidConv(
                    dim, k, stride, self.conv_bias, self.dtype, name=f"conv_{i}"
                )(x)
            elif impl == "im2col":
                x = _Im2ColConvGeneral(
                    dim, k, stride, self.conv_bias, self.dtype, name=f"conv_{i}"
                )(x)
            else:
                x = nn.Conv(
                    features=dim,
                    kernel_size=(k,),
                    strides=(stride,),
                    padding="VALID",
                    use_bias=self.conv_bias,
                    dtype=self.dtype,
                    name=f"conv_{i}",
                )(x)
            if self.mode == "layer_norm":
                if not train and os.environ.get("S3PRL_MIDLN", "xla") == "pallas":
                    # Opt-in A/B knob, NOT the default: standalone XLA LN+GELU
                    # measures ~194 GB/s vs the chip's ~793 GB/s copy rate
                    # (tools/bench_hbm.py), but IN-GRAPH the kernel boundary
                    # breaks XLA's conv/LN/GELU consumer fusion and the full
                    # path LOSES (3,489 vs 4,423 audio-sec/s on-chip, r4 A/B).
                    # Kept for re-measurement on future compiler versions.
                    from ..kernels.ln_gelu import ln_gelu

                    g, bt = _NormParams(dim, name=f"ln_{i}")()
                    x = ln_gelu(
                        x, g, bt, interpret=jax.default_backend() == "cpu",
                        gelu_mode="tanh" if serving_tanh else None,
                    )
                    continue  # GELU folded into the kernel epilogue
                x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"ln_{i}")(x).astype(self.dtype)
            elif self.mode == "default" and i == 0:
                # groups == channels: per-channel instance norm over time
                x = nn.GroupNorm(
                    num_groups=dim, epsilon=1e-5, dtype=jnp.float32, name="gn_0"
                )(x).astype(self.dtype)
            x = nn.gelu(x, approximate=serving_tanh)
        return x
