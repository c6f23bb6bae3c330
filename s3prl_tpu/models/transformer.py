"""Transformer encoder with convolutional relative positional embedding.

Behavioral spec from the reference's TransformerEncoder /
TransformerSentenceEncoderLayer (s3prl/upstream/wav2vec2/wav2vec2_model.py:
2937-3054, 3214-3321): grouped-conv positional embedding (kernel 128, 16
groups, same-pad with even-kernel trim, GELU), pre-LN or post-LN residual
blocks, per-layer hidden-state capture (the reference does this with forward
hooks on every layer, interfaces.py:74-98 — here every layer input plus the
final output is simply returned).

TPU-first design notes:
- the L encoder layers run under `nn.scan` with stacked parameters: one
  compiled layer body regardless of depth (compile time O(1) in L), hidden
  states collected as the scan's per-step output [L, B, T, C];
- fp32 softmax inside attention, everything else in `dtype` (bf16 on TPU);
- optional `nn.remat` on the scanned layer for training memory;
- no data-dependent shapes: padding is handled by masks, layerdrop by a
  per-layer keep gate.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np



class ConvPositionalEmbedding(nn.Module):
    """Grouped conv positional embedding (wav2vec2_model.py:2937 make_conv_pos).

    The reference wraps the conv in torch weight_norm; that is a pure
    reparametrization, so converted checkpoints fold it into the kernel and
    from-scratch training uses a plain kernel.

    `depth > 1` builds the data2vec-style stack (wav2vec2_model.py:2995-3022
    make_conv_block): `depth` blocks of conv(k = max(3, conv_pos//depth)) +
    same-pad trim + affine-free LayerNorm + GELU.
    """

    features: int
    kernel_size: int = 128
    groups: int = 16
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.depth > 1:
            k = max(3, self.kernel_size // self.depth)
            for i in range(self.depth):
                pad = k // 2
                x = nn.Conv(
                    features=self.features,
                    kernel_size=(k,),
                    padding=((pad, pad),),
                    feature_group_count=self.groups,
                    dtype=self.dtype,
                    name=f"conv_{i}",
                )(x)
                if k % 2 == 0:
                    x = x[:, :-1, :]
                x = nn.LayerNorm(
                    epsilon=1e-5, use_bias=False, use_scale=False,
                    dtype=jnp.float32, name=f"ln_{i}",
                )(x).astype(self.dtype)
                x = nn.gelu(x, approximate=False)
            return x
        import os

        from ..kernels.posconv import TC as _PTC, TC_Q8 as _PTC_Q8

        k = self.kernel_size
        posconv_impl = os.environ.get("S3PRL_POSCONV", "")
        # per-impl tap-chunk divisor: the q8 kernel consumes taps in int8
        # sublane tiles (32), the bf16 one in bf16 tiles (16)
        _tap_div = _PTC_Q8 if posconv_impl == "pallas_q8" else _PTC
        if (
            posconv_impl in ("pallas", "pallas_q8")
            and k % 2 == 0 and k % _tap_div == 0
            and self.features % self.groups == 0
            and x.shape[1] <= 2048  # kernel VMEM bound; XLA beyond
        ):
            # grouped-conv-as-long-K-GEMMs Pallas kernel (kernels/posconv.py)
            # — opt-in A/B knob for serving; identical param path to nn.Conv.
            # "pallas_q8" runs the int8 W8A8 twin (per-(batch,group) window
            # scale; quality pinned in tests/test_kernels.py)
            from ..kernels.posconv import pos_conv_gelu, pos_conv_gelu_q8

            class _ConvParams(nn.Module):
                shape: tuple

                @nn.compact
                def __call__(self):
                    kern = self.param(
                        "kernel", nn.initializers.lecun_normal(), self.shape,
                        jnp.float32,
                    )
                    bias = self.param(
                        "bias", nn.initializers.zeros, (self.shape[-1],),
                        jnp.float32,
                    )
                    return kern, bias

            kern, bias = _ConvParams(
                (k, self.features // self.groups, self.features), name="conv"
            )()
            import jax as _jax

            fn = pos_conv_gelu_q8 if posconv_impl == "pallas_q8" else pos_conv_gelu
            return fn(
                x, kern, bias, groups=self.groups,
                interpret=_jax.default_backend() == "cpu",
            )
        pad = k // 2
        out = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            padding=((pad, pad),),
            feature_group_count=self.groups,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.kernel_size % 2 == 0:  # SamePad: drop the trailing frame
            out = out[:, :-1, :]
        return nn.gelu(out, approximate=False)


class SelfAttention(nn.Module):
    """Multi-head self-attention with fused QKV projection.

    Equivalent to the reference's MultiheadAttention (wav2vec2_model.py:777)
    in self-attention mode: q scaled by head_dim**-0.5, bias on all
    projections, fp32 softmax.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False  # Pallas fused attention (forward-only paths)
    quantize: bool = False  # int8 W8A8 projections (serving; ops/quant.py)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, C]
        key_padding_mask: Optional[jnp.ndarray] = None,  # [B, T] True = PAD
        attn_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        rel_bias: Optional[tuple] = None,  # (pos_bias [H,T,T], gate [B,H,T])
    ) -> jnp.ndarray:
        from ..ops.quant import dense

        B, T, C = x.shape
        H = self.num_heads
        Dh = C // H
        qkv = dense(3 * C, quantize=self.quantize, dtype=self.dtype,
                    name="qkv")(x)  # one MXU matmul
        kv_lens = (
            (~key_padding_mask).sum(-1).astype(jnp.int32)
            if key_padding_mask is not None
            else jnp.full((B,), T, jnp.int32)
        )
        if self.use_flash and rel_bias is not None and attn_bias is None:
            # WavLM's gated rel-pos bias: the [T, T] gated-bias tensors stay
            # in VMEM (kernels/flash_attention.py gated_bias_attention)
            from ..kernels.flash_attention import gated_bias_attention

            pos_bias, gate = rel_bias
            qkv_h = qkv.reshape(B, T, 3, H, Dh).transpose(0, 3, 2, 1, 4)
            q = qkv_h[:, :, 0] * (Dh ** -0.5)  # [B, H, T, Dh]
            out = gated_bias_attention(
                q, qkv_h[:, :, 1], qkv_h[:, :, 2],
                pos_bias.astype(jnp.float32), gate.astype(jnp.float32),
                kv_lens,
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        elif self.use_flash and attn_bias is None and rel_bias is None:
            from ..kernels.flash_attention import fused_qkv_attention

            out = fused_qkv_attention(qkv, kv_lens, H)
        else:
            if rel_bias is not None and attn_bias is None:
                pos_bias, gate = rel_bias
                attn_bias = gate[..., None] * pos_bias[None]
            # heads-last path: pure reshapes of the qkv buffer, the head axis
            # rides as an einsum batch dim (see ops/attention.py attention_bthd)
            from ..ops.attention import attention_bthd

            qkv = qkv.reshape(B, T, 3, H, Dh)
            q = qkv[:, :, 0] * (Dh ** -0.5)
            out = attention_bthd(q, qkv[:, :, 1], qkv[:, :, 2],
                                 key_padding_mask, attn_bias)
            out = out.reshape(B, T, C)
        return dense(C, quantize=self.quantize, dtype=self.dtype,
                     name="out_proj")(out)


def _fused_block_available() -> bool:
    """The fused int8 serving kernels run on TPU; the Pallas kernels
    auto-interpret on CPU (tests override this to exercise the path)."""
    return jax.default_backend() == "tpu"


def _attn_block_enabled() -> bool:
    """S3PRL_ATTN_BLOCK=0 disables the whole-block fused attention kernel
    (LN+QKV+MHA+out-proj+residual in one pass, kernels/flash_attention.py)
    and falls back to the split LN -> int8 QKV -> attention+out-proj path."""
    import os

    return os.environ.get("S3PRL_ATTN_BLOCK", "1") == "1"


def _static_act_enabled() -> bool:
    """Opt-in (S3PRL_STATIC_ACT=1): per-layer STATIC activation scales
    (calibrated once at qcache materialization) inside the whole-block
    attention kernel, replacing the dynamic per-row scales. The isolated
    kernel probe wins 0.891 vs 0.949 ms/layer (the two abs-max reduce +
    divide passes vanish; tools/exp_encoder_tiles.py attn_static), but at
    the 24L ENCODER level with the real serving artifacts the delta is a
    measured WASH (52.861 vs 52.842 ms/iter interleaved,
    tools/exp_static_act_ab.py) and end-to-end bench pairs read neutral—
    slightly negative — the dynamic VPU passes apparently overlap with the
    kernel's DMA/MXU pipeline at production shapes. Default stays dynamic
    (finer quant granularity, no calibration-transfer assumption); quality
    of the static path is pinned by tests/test_quant.py
    (test_qcache_static_activation_scales + the 24L serving-path gate)."""
    import os

    return os.environ.get("S3PRL_STATIC_ACT", "0") == "1"


def _bf16_block_enabled() -> bool:
    """S3PRL_BF16_BLOCK=0 disables the bf16 whole-block attention kernel on
    the reference-precision (quantize=False) serving path and falls back to
    the XLA LN/QKV + fused_qkv_attention + XLA out-proj split."""
    import os

    return os.environ.get("S3PRL_BF16_BLOCK", "1") == "1"


def _qkv_fuse_enabled() -> bool:
    """Opt-in (S3PRL_QKV_FUSE=1): Pallas LN+quant+QKV+dequant single pass in
    place of the XLA LayerNorm + QuantDense pair. MEASURED SLOWER on the
    axon tunnel v5e (3.006 vs 2.581 ms/layer, tools/bench_layer.py) — XLA's
    quantized GEMM beats the Pallas linear kernel at the [16k,1024]x[1024,
    3072] shape; kept as an A/B knob for other hardware."""
    import os

    return os.environ.get("S3PRL_QKV_FUSE", "0") == "1"


def _full_fuse_enabled() -> bool:
    """Opt-in (S3PRL_FULL_FUSE=1): Pallas-fused QKV/out-proj linears too.
    Measured slower than XLA QuantDense projections on the tunnel chip."""
    import os

    return os.environ.get("S3PRL_FULL_FUSE", "0") == "1"


class _AttnProjParams(nn.Module):
    """Declares SelfAttention's qkv/out_proj params (same tree) for the
    fused serving path that consumes the weights directly."""

    embed_dim: int

    @nn.compact
    def __call__(self):
        from ..ops.quant import LinearParams

        q = LinearParams(self.embed_dim, 3 * self.embed_dim, name="qkv")()
        o = LinearParams(self.embed_dim, self.embed_dim, name="out_proj")()
        return q, o


class EncoderLayer(nn.Module):
    """Pre-/post-LN transformer block (wav2vec2_model.py:3214)."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    layer_norm_first: bool = False
    dropout: float = 0.1
    activation_dropout: float = 0.0
    attention_dropout: float = 0.1
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    quantize: bool = False
    layer_norm_eps: float = 1e-5  # timm ViT blocks use 1e-6

    def _act(self, x):
        if self.activation == "gelu":
            return nn.gelu(x, approximate=False)
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "swish":
            return nn.silu(x)
        raise ValueError(self.activation)

    def _qw(self, name, w):
        # serving weights quantize ONCE per loaded model (qcache collection;
        # measured +0.12 ms/layer when re-quantized every forward)
        from ..ops.quant import cached_quantize_cols

        return cached_quantize_cols(self, name, w)

    def _attn_act_scales(self, x, kq, bq, g_ln, b_ln):
        """Per-layer static activation scales (s_x for the LN output feeding
        the QKV GEMM, s_a for the pre-out-proj attention context) for the
        whole-block attention kernel, calibrated ONCE during the qcache
        materialization probe (upstream/registry._materialize_qcache) by
        running the block's float math in XLA and taking abs-max * margin.

        The margin (1.35) covers the probe-vs-serving extreme-value gap
        (abs-max over ~50k probe activations vs ~16M serving activations
        grows ~sqrt(ln n): ~1.24x for Gaussian-ish tails); anything beyond
        saturates the int8 clip, which only truncates the single largest
        outlier channel. Returns None when no calibration is available
        (training, user param trees without a qcache)."""
        name = "attn_act_scales"
        if self.is_mutable_collection("qcache"):
            def calib():
                xf = jax.lax.stop_gradient(x).astype(jnp.float32)
                mean = jnp.mean(xf, axis=-1, keepdims=True)
                var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
                xn = (xf - mean) * jax.lax.rsqrt(var + self.layer_norm_eps)
                xn = xn * g_ln + b_ln
                qkv = xn @ kq.astype(jnp.float32) + bq.astype(jnp.float32)
                C = self.embed_dim
                Dh = C // self.num_heads
                Bc, T, _ = qkv.shape
                q, k, v = jnp.split(qkv, 3, axis=-1)
                q = q.reshape(Bc, T, self.num_heads, Dh)
                k = k.reshape(Bc, T, self.num_heads, Dh)
                v = v.reshape(Bc, T, self.num_heads, Dh)
                scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * Dh ** -0.5
                p = jax.nn.softmax(scores, axis=-1)
                ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(Bc, T, C)
                margin = 1.35
                sx = jnp.max(jnp.abs(xn)) * margin / 127.0
                sa = jnp.max(jnp.abs(ctx)) * margin / 127.0
                return jnp.stack([jnp.maximum(sx, 1e-8),
                                  jnp.maximum(sa, 1e-8)]).astype(jnp.float32)

            return self.variable("qcache", name, calib).value
        if self.has_variable("qcache", name):
            return self.get_variable("qcache", name)
        return None

    def _fused_block(self, x, key_padding_mask):
        # helper called from the compact __call__ — declares the same
        # submodule/param names as the unfused path
        from ..kernels.ffn import fused_int8_ffn, fused_int8_linear
        from ..kernels.flash_attention import fused_qkv_attention
        from ..ops.quant import LinearParams, NormParams

        C = self.embed_dim
        ln1 = NormParams(C, name="self_attn_layer_norm")()
        (kq, bq), (ko, bo) = _AttnProjParams(C, name="self_attn")()
        ln2 = NormParams(C, name="final_layer_norm")()
        k1, b1 = LinearParams(C, self.ffn_dim, name="fc1")()
        k2, b2 = LinearParams(self.ffn_dim, C, name="fc2")()

        B, T, _ = x.shape
        kv_lens = (
            (~key_padding_mask).sum(-1).astype(jnp.int32)
            if key_padding_mask is not None
            else jnp.full((B,), T, jnp.int32)
        )
        qkv = fused_int8_linear(x, self._qw("qkv_q8", kq), bq, ln=ln1)
        a = fused_qkv_attention(qkv, kv_lens, self.num_heads)
        x = fused_int8_linear(a, self._qw("out_proj_q8", ko), bo, residual=x)
        return fused_int8_ffn(x, self._qw("fc1_q8", k1), b1,
                              self._qw("fc2_q8", k2), b2, ln=ln2, residual=True)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        attn_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        quant_serving = (
            self.quantize and deterministic and self.activation == "gelu"
            and _fused_block_available()
        )
        if (
            quant_serving and self.layer_norm_first and self.use_flash
            and attn_bias is None and self.layer_norm_eps == 1e-5
            and _full_fuse_enabled()
        ):
            # whole pre-LN block as 4 fused kernels (LN+QKV, attention,
            # out-proj+residual, LN+FFN+residual). Param tree is identical
            # to the unfused modules below. MEASURED SLOWER than the
            # partial fusion on the axon tunnel chip (3,025 vs 3,215
            # audio-sec/s) — the XLA QuantDense projections beat the
            # Pallas linear kernel at these shapes — kept behind
            # S3PRL_FULL_FUSE=1 for A/B on other hardware.
            return self._fused_block(x, key_padding_mask)
        attn = lambda h: SelfAttention(
            self.embed_dim, self.num_heads, self.attention_dropout, self.dtype,
            self.use_flash, self.quantize, name="self_attn",
        )(h, key_padding_mask, attn_bias, deterministic)
        # constructed at point of use: the fused-QKV serving branch declares
        # the same "self_attn_layer_norm" name via NormParams instead
        ln_attn = lambda h: nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=jnp.float32,
            name="self_attn_layer_norm",
        )(h)
        drop = lambda h: nn.Dropout(self.dropout)(h, deterministic=deterministic)
        drop_act = lambda h: nn.Dropout(self.activation_dropout)(h, deterministic=deterministic)

        def ffn(h):
            from ..ops.quant import LinearParams, dense

            if quant_serving:  # one VMEM pass, int8 weights (kernels/ffn.py)
                from ..kernels.ffn import fused_int8_ffn

                k1, b1 = LinearParams(self.embed_dim, self.ffn_dim, name="fc1")()
                k2, b2 = LinearParams(self.ffn_dim, self.embed_dim, name="fc2")()
                return fused_int8_ffn(h, self._qw("fc1_q8", k1), b1,
                                      self._qw("fc2_q8", k2), b2)
            h = self._act(dense(self.ffn_dim, quantize=self.quantize,
                                dtype=self.dtype, name="fc1")(h))
            h = drop_act(h)
            return dense(self.embed_dim, quantize=self.quantize,
                         dtype=self.dtype, name="fc2")(h)

        if self.layer_norm_first:
            if quant_serving and self.use_flash and attn_bias is None:
                # attention + int8 out-proj + residual in one kernel: the
                # raw attention output never round-trips HBM
                from ..kernels.flash_attention import fused_qkv_attention_outproj
                from ..ops.quant import int8_matmul

                (kq, bq), (ko, bo) = _AttnProjParams(
                    self.embed_dim, name="self_attn")()
                B, T, _ = x.shape
                from ..kernels.flash_attention import MAX_BLOCK_T

                if _attn_block_enabled() and T <= MAX_BLOCK_T:
                    # whole attention block (LN + int8 QKV + MHA + int8
                    # out-proj + residual) in ONE kernel: x makes a single
                    # HBM round trip (kernels/flash_attention.py
                    # fused_attention_block)
                    from ..kernels.flash_attention import fused_attention_block
                    from ..ops.quant import NormParams

                    g_ln, b_ln = NormParams(
                        self.embed_dim, name="self_attn_layer_norm")()
                    kv_lens = (
                        (~key_padding_mask).sum(-1).astype(jnp.int32)
                        if key_padding_mask is not None
                        else jnp.full((B,), T, jnp.int32)
                    )
                    act_scales = (
                        self._attn_act_scales(x, kq, bq, g_ln, b_ln)
                        if _static_act_enabled() else None
                    )
                    x = fused_attention_block(
                        x, self._qw("qkv_q8", kq), bq, (g_ln, b_ln),
                        self._qw("out_proj_q8", ko), bo, kv_lens,
                        self.num_heads, act_scales=act_scales)
                else:
                    if _qkv_fuse_enabled():
                        # LN + quantize + QKV GEMM + dequant in one Pallas
                        # pass (A/B vs QuantDense via S3PRL_QKV_FUSE=1)
                        from ..kernels.ffn import fused_int8_linear
                        from ..ops.quant import NormParams

                        g_ln, b_ln = NormParams(
                            self.embed_dim, name="self_attn_layer_norm")()
                        qkv = fused_int8_linear(
                            x, self._qw("qkv_q8", kq), bq, ln=(g_ln, b_ln))
                    else:
                        h = ln_attn(x).astype(self.dtype)
                        qkv = int8_matmul(h, self._qw("qkv_q8", kq), bq,
                                          out_dtype=self.dtype)
                    kv_lens = (
                        (~key_padding_mask).sum(-1).astype(jnp.int32)
                        if key_padding_mask is not None
                        else jnp.full((B,), T, jnp.int32)
                    )
                    x = fused_qkv_attention_outproj(
                        qkv, x, self._qw("out_proj_q8", ko), bo, kv_lens,
                        self.num_heads)
            else:
                from ..kernels.flash_attention import MAX_BLOCK_T

                bf16_block = (
                    deterministic and not self.quantize
                    and self.dtype == jnp.bfloat16 and self.use_flash
                    and attn_bias is None and self.layer_norm_eps == 1e-5
                    and _fused_block_available() and _attn_block_enabled()
                    and _bf16_block_enabled() and x.shape[1] <= MAX_BLOCK_T
                )
                if bf16_block:
                    # reference-precision serving: the whole pre-LN
                    # attention block in one kernel (bf16 twin of the int8
                    # whole-block path; same param tree as the modules)
                    from ..kernels.flash_attention import (
                        fused_attention_block_bf16,
                    )
                    from ..ops.quant import NormParams

                    (kq, bq), (ko, bo) = _AttnProjParams(
                        self.embed_dim, name="self_attn")()
                    g_ln, b_ln = NormParams(
                        self.embed_dim, name="self_attn_layer_norm")()
                    B = x.shape[0]
                    kv_lens = (
                        (~key_padding_mask).sum(-1).astype(jnp.int32)
                        if key_padding_mask is not None
                        else jnp.full((B,), x.shape[1], jnp.int32)
                    )
                    x = fused_attention_block_bf16(
                        x, kq, bq, (g_ln, b_ln), ko, bo, kv_lens,
                        self.num_heads)
                else:
                    x = x + drop(attn(ln_attn(x).astype(self.dtype)))
            if quant_serving and self.layer_norm_eps == 1e-5:
                # final_layer_norm + FFN + residual in one kernel pass —
                # the LN read-modify-write and the residual add never
                # round-trip HBM (kernels/ffn.py); param tree unchanged
                from ..kernels.ffn import fused_int8_ffn
                from ..ops.quant import LinearParams, NormParams

                g, be = NormParams(self.embed_dim, name="final_layer_norm")()
                k1, b1 = LinearParams(self.embed_dim, self.ffn_dim, name="fc1")()
                k2, b2 = LinearParams(self.ffn_dim, self.embed_dim, name="fc2")()
                x = fused_int8_ffn(x, self._qw("fc1_q8", k1), b1,
                                   self._qw("fc2_q8", k2), b2, ln=(g, be),
                                   residual=True)
            elif (
                deterministic and not self.quantize
                and self.dtype == jnp.bfloat16 and self.use_flash
                and self.activation == "gelu" and self.layer_norm_eps == 1e-5
                and self.ffn_dim % 128 == 0
                and _fused_block_available() and _bf16_block_enabled()
            ):
                # reference-precision serving: LN + fc1 + erf GELU + fc2 +
                # residual in one kernel (bf16 twin of fused_int8_ffn; the
                # [rows, FFN] intermediate never round-trips HBM)
                from ..kernels.ffn import fused_bf16_ffn
                from ..ops.quant import LinearParams, NormParams

                g, be = NormParams(self.embed_dim, name="final_layer_norm")()
                k1, b1 = LinearParams(self.embed_dim, self.ffn_dim, name="fc1")()
                k2, b2 = LinearParams(self.ffn_dim, self.embed_dim, name="fc2")()
                x = fused_bf16_ffn(x, k1, b1, k2, b2, ln=(g, be),
                                   residual=True)
            else:
                ln_final = nn.LayerNorm(
                    epsilon=self.layer_norm_eps, dtype=jnp.float32,
                    name="final_layer_norm",
                )
                x = x + drop(ffn(ln_final(x).astype(self.dtype)))
        else:
            # post-LN block order (HuBERT-Base / wav2vec2-Base family,
            # fairseq layer_norm_first=False): x = LN1(x + attn(x));
            # x = LN2(x + ffn(x)). Serving routes through the same
            # whole-block kernels as the pre-LN branch with the LN moved
            # to the kernel epilogue (postnorm=True); training and unfused
            # configs fall back to the XLA modules below.
            from ..kernels.flash_attention import MAX_BLOCK_T

            B, T, _ = x.shape
            block_ok = (
                self.use_flash and attn_bias is None
                and self.layer_norm_eps == 1e-5 and T <= MAX_BLOCK_T
                and _attn_block_enabled()
            )
            bf16_serving = (
                deterministic and not self.quantize
                and self.dtype == jnp.bfloat16 and self.use_flash
                and self.activation == "gelu" and self.layer_norm_eps == 1e-5
                and _fused_block_available() and _bf16_block_enabled()
            )
            if (quant_serving or bf16_serving) and block_ok:
                from ..ops.quant import NormParams

                (kq, bq), (ko, bo) = _AttnProjParams(
                    self.embed_dim, name="self_attn")()
                g_ln, b_ln = NormParams(
                    self.embed_dim, name="self_attn_layer_norm")()
                kv_lens = (
                    (~key_padding_mask).sum(-1).astype(jnp.int32)
                    if key_padding_mask is not None
                    else jnp.full((B,), T, jnp.int32)
                )
                if quant_serving:
                    from ..kernels.flash_attention import fused_attention_block

                    x = fused_attention_block(
                        x, self._qw("qkv_q8", kq), bq, (g_ln, b_ln),
                        self._qw("out_proj_q8", ko), bo, kv_lens,
                        self.num_heads, postnorm=True)
                else:
                    from ..kernels.flash_attention import (
                        fused_attention_block_bf16,
                    )

                    x = fused_attention_block_bf16(
                        x, kq, bq, (g_ln, b_ln), ko, bo, kv_lens,
                        self.num_heads, postnorm=True)
            elif (
                quant_serving and self.use_flash and attn_bias is None
                and _attn_block_enabled()
            ):
                # long-T (> MAX_BLOCK_T) post-LN split: int8 QKV on RAW x +
                # fused attention+out-proj+residual kernel, then the LN as
                # the XLA epilogue — the post-LN twin of the pre-LN split
                # path (the raw attention output never round-trips HBM)
                from ..kernels.flash_attention import (
                    fused_qkv_attention_outproj,
                )
                from ..ops.quant import int8_matmul

                (kq, bq), (ko, bo) = _AttnProjParams(
                    self.embed_dim, name="self_attn")()
                qkv = int8_matmul(x.astype(self.dtype),
                                  self._qw("qkv_q8", kq), bq,
                                  out_dtype=self.dtype)
                kv_lens = (
                    (~key_padding_mask).sum(-1).astype(jnp.int32)
                    if key_padding_mask is not None
                    else jnp.full((B,), T, jnp.int32)
                )
                y = fused_qkv_attention_outproj(
                    qkv, x, self._qw("out_proj_q8", ko), bo, kv_lens,
                    self.num_heads)
                x = ln_attn(y).astype(self.dtype)
            else:
                x = ln_attn(x + drop(attn(x))).astype(self.dtype)
            if (
                (quant_serving or (bf16_serving and self.ffn_dim % 128 == 0))
                and self.layer_norm_eps == 1e-5
            ):
                # FFN + residual + final_layer_norm in one kernel pass
                # (postnorm epilogue LN); param tree unchanged
                from ..ops.quant import LinearParams, NormParams

                g, be = NormParams(self.embed_dim, name="final_layer_norm")()
                k1, b1 = LinearParams(self.embed_dim, self.ffn_dim, name="fc1")()
                k2, b2 = LinearParams(self.ffn_dim, self.embed_dim, name="fc2")()
                if quant_serving:
                    from ..kernels.ffn import fused_int8_ffn

                    x = fused_int8_ffn(x, self._qw("fc1_q8", k1), b1,
                                       self._qw("fc2_q8", k2), b2, ln=(g, be),
                                       residual=True, postnorm=True)
                else:
                    from ..kernels.ffn import fused_bf16_ffn

                    x = fused_bf16_ffn(x, k1, b1, k2, b2, ln=(g, be),
                                       residual=True, postnorm=True)
            else:
                ln_final = nn.LayerNorm(
                    epsilon=self.layer_norm_eps, dtype=jnp.float32,
                    name="final_layer_norm")
                x = ln_final(x + drop(ffn(x))).astype(self.dtype)
        return x


class TransformerEncoder(nn.Module):
    """Encoder stack returning all layer inputs + final output.

    Output hidden_states has L+1 entries, matching the reference's hook
    layout: [input to layer 0, ..., input to layer L-1, encoder output]
    (reference: s3prl/upstream/hubert/expert.py:36-45).
    """

    embed_dim: int = 768
    ffn_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    layer_norm_first: bool = False
    dropout: float = 0.1
    activation_dropout: float = 0.0
    attention_dropout: float = 0.1
    activation: str = "gelu"
    conv_pos: int = 128
    conv_pos_groups: int = 16
    pos_conv_depth: int = 1
    layerdrop: float = 0.0
    remat: bool = False
    use_flash: bool = False
    quantize: bool = False  # int8 W8A8 layer projections (serving)
    layer_type: str = "transformer"  # "transformer" | "conformer"
    use_pos_conv: bool = True  # skip_pos_conv variant (wav2vec2_model.py:3026-3028)
    pos_enc_type: str = "rel_pos"  # conformer: "abs" | "rel_pos" | "rope"
    depthwise_conv_kernel_size: int = 31
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, C]
        key_padding_mask: Optional[jnp.ndarray] = None,  # [B, T] True = PAD
        attn_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        layer_weights: Optional[jnp.ndarray] = None,  # [L+1] fused weighted sum
    ):
        """Returns (final[B,T,C], hidden_states).

        hidden_states is [L+1, B, T, C] normally. With `layer_weights` the
        per-layer states are never materialized: the scan carries a running
        accumulator `acc += w_i * x_i` and hidden_states comes back as the
        weighted sum [1, B, T, C] — for HuBERT-Large extraction this removes
        ~2.4 GB of HBM traffic per batch (stack + concat + match-length
        copies) on the SUPERB weighted-sum serving path.
        """
        conformer = self.layer_type == "conformer"
        if key_padding_mask is not None:
            x = jnp.where(key_padding_mask[..., None], 0.0, x)
        if self.use_pos_conv and not conformer:
            # the reference ConformerEncoder never applies the conv pos
            # embedding (its extract_features override, wav2vec2_model.py
            # ConformerEncoder:3171-3211); positions come from rel-pos/rope
            x = x + ConvPositionalEmbedding(
                self.embed_dim, self.conv_pos, self.conv_pos_groups,
                self.pos_conv_depth, self.dtype, name="pos_conv",
            )(x)
        pos_emb = None
        if conformer and self.pos_enc_type == "rel_pos":
            pos_emb = jnp.asarray(
                relative_positional_table(x.shape[1], self.embed_dim)
            )
        if not self.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm")(x).astype(self.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        layer_cls = ConformerLayer if self.layer_type == "conformer" else EncoderLayer
        if self.remat:
            layer_cls = nn.remat(layer_cls, static_argnums=(4,))

        fused = layer_weights is not None

        third_arg = pos_emb if conformer else attn_bias

        def body(layer, carry, w):
            h, acc = carry
            out = layer(h, key_padding_mask, third_arg, deterministic)
            if self.layerdrop > 0.0 and not deterministic:
                keep = jax.random.bernoulli(
                    layer.make_rng("layerdrop"), 1.0 - self.layerdrop
                )
                out = jnp.where(keep, out, h)
            if fused:
                return (out, acc + w.astype(h.dtype) * h), None
            return (out, acc), h  # collect the layer *input*

        scan = nn.scan(
            body,
            variable_axes={"params": 0, "batch_stats": 0, "qcache": 0},
            split_rngs={"params": True, "dropout": True, "layerdrop": True},
            length=self.num_layers,
        )
        if conformer:
            layer = layer_cls(
                self.embed_dim, self.ffn_dim, self.num_heads, self.dropout,
                depthwise_kernel=self.depthwise_conv_kernel_size,
                pos_enc_type=self.pos_enc_type, dtype=self.dtype, name="layers",
            )
        else:
            layer = layer_cls(
                self.embed_dim, self.ffn_dim, self.num_heads, self.layer_norm_first,
                self.dropout, self.activation_dropout, self.attention_dropout,
                self.activation, self.dtype, self.use_flash, self.quantize,
                name="layers",
            )
        acc0 = jnp.zeros_like(x) if fused else jnp.zeros((), x.dtype)
        ws = layer_weights[: self.num_layers, None] if fused else jnp.zeros((self.num_layers, 1))
        (x, acc), layer_inputs = scan(layer, (x, acc0), ws)

        if self.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm")(x).astype(self.dtype)

        if fused:
            weighted = acc + layer_weights[self.num_layers].astype(x.dtype) * x
            return x, weighted[None]
        hidden_states = jnp.concatenate([layer_inputs, x[None]], axis=0)
        return x, hidden_states


def relative_positional_table(T: int, d_model: int) -> np.ndarray:
    """Transformer-XL style sinusoid table [2T-1, d] (reference:
    wav2vec2_model.py RelPositionalEncoding:1525-1589): rows ordered from
    relative position T-1 down to -(T-1)."""
    position = np.arange(T, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model))
    pos = np.zeros((T, d_model))
    neg = np.zeros((T, d_model))
    pos[:, 0::2] = np.sin(position * div)
    pos[:, 1::2] = np.cos(position * div)
    neg[:, 0::2] = np.sin(-position * div)
    neg[:, 1::2] = np.cos(-position * div)
    return np.concatenate([pos[::-1], neg[1:]], axis=0).astype(np.float32)


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, 2T-1] -> [B, H, T, T] (wav2vec2_model.py rel_shift:188-206)."""
    B, H, T, P = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    xp = xp.reshape(B, H, P + 1, T)
    return xp[:, :, 1:].reshape(B, H, T, P)[..., : (P + 1) // 2]


class EspnetSelfAttention(nn.Module):
    """ESPnet-style MHA with optional Transformer-XL relative positions or
    rotary embeddings (reference: ESPNETMultiHeadedAttention:74-163,
    RelPositionMultiHeadedAttention:165-253,
    RotaryPositionMultiHeadedAttention:255-311): separate q/k/v/out linears,
    scores scaled by 1/sqrt(d_k) after the matmul; rope rotates the layer
    INPUT viewed as heads before the projections (as the reference does)."""

    embed_dim: int
    num_heads: int
    pos_enc_type: str = "rel_pos"  # "abs" | "rel_pos" | "rope"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_padding_mask=None, pos_emb=None, deterministic=True):
        from ..ops.attention import attention_bthd

        B, T, C = x.shape
        H = self.num_heads
        Dh = C // H
        x_in = x
        if self.pos_enc_type == "rope":
            # rotate the raw input per head dim, then project (reference
            # RotaryPositionMultiHeadedAttention.forward:287-301)
            inv_freq = 1.0 / (10000 ** (np.arange(0, Dh, 2) / Dh))
            t = np.arange(T)[:, None] * inv_freq[None, :]
            emb = np.concatenate([t, t], axis=-1)
            cos = jnp.asarray(np.cos(emb), x.dtype)[None, :, None, :]
            sin = jnp.asarray(np.sin(emb), x.dtype)[None, :, None, :]
            xh = x.reshape(B, T, H, Dh)
            rot = jnp.concatenate([-xh[..., Dh // 2 :], xh[..., : Dh // 2]], -1)
            x_in = (xh * cos + rot * sin).reshape(B, T, C)
        q = nn.Dense(C, dtype=self.dtype, name="linear_q")(x_in).reshape(B, T, H, Dh)
        k = nn.Dense(C, dtype=self.dtype, name="linear_k")(x_in).reshape(B, T, H, Dh)
        v = nn.Dense(C, dtype=self.dtype, name="linear_v")(x).reshape(B, T, H, Dh)
        scale = Dh ** -0.5

        if self.pos_enc_type == "rel_pos":
            assert pos_emb is not None
            pos_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (H, Dh), jnp.float32)
            pos_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (H, Dh), jnp.float32)
            p = nn.Dense(C, use_bias=False, dtype=self.dtype, name="linear_pos")(
                pos_emb.astype(self.dtype)
            ).reshape(-1, H, Dh)  # [2T-1, H, Dh]
            q_u = q + pos_u.astype(q.dtype)
            q_v = q + pos_v.astype(q.dtype)
            ac = jnp.einsum("bthd,bshd->bhts", q_u, k, preferred_element_type=jnp.float32)
            bd = jnp.einsum("bthd,phd->bhtp", q_v, p, preferred_element_type=jnp.float32)
            scores = (ac + _rel_shift(bd)) * scale
            if key_padding_mask is not None:
                scores = jnp.where(key_padding_mask[:, None, None, :], -1e9, scores)
            probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhts,bshd->bthd", probs, v)
        else:
            out = attention_bthd(q * scale, k, v, key_padding_mask)
        out = out.reshape(B, T, C)
        return nn.Dense(C, dtype=self.dtype, name="linear_out")(out)


class ConformerLayer(nn.Module):
    """Macaron Conformer block, faithful to the reference's
    ConformerWav2Vec2EncoderLayer (wav2vec2_model.py:441-594 with
    FeedForwardModule:396-431, ConvolutionModule:313-394): half-step FFNs
    (LN -> w_1 -> swish -> drop -> w_2 -> drop), pre-LN ESPnet attention,
    conv module (LN -> pointwise GLU -> depthwise k=31 SAME -> BN -> swish
    -> pointwise -> drop), final LN. Param names mirror the torch modules."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    depthwise_kernel: int = 31
    pos_enc_type: str = "rel_pos"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        pos_emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        drop = lambda h: nn.Dropout(self.dropout)(h, deterministic=deterministic)

        def ffn(h, name):
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"{name}_layer_norm")(h).astype(self.dtype)
            h = nn.silu(nn.Dense(self.ffn_dim, dtype=self.dtype, name=f"{name}_w1")(h))
            h = drop(h)
            return drop(nn.Dense(self.embed_dim, dtype=self.dtype, name=f"{name}_w2")(h))

        x = 0.5 * ffn(x, "ffn1") + x

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="self_attn_layer_norm")(x).astype(self.dtype)
        h = EspnetSelfAttention(
            self.embed_dim, self.num_heads, self.pos_enc_type, self.dtype,
            name="self_attn",
        )(h, key_padding_mask, pos_emb, deterministic)
        x = x + drop(h)

        # convolution module (carries its own entry LayerNorm)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="conv_ln")(x).astype(self.dtype)
        h = nn.Dense(2 * self.embed_dim, use_bias=False, dtype=self.dtype, name="conv_pw1")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # GLU
        # NOTE: the reference does NOT re-mask padded positions before the
        # depthwise conv (ConvolutionModule.forward); the encoder zeroes pads
        # once at entry and lets the conv bleed — replicated for parity
        h = nn.Conv(self.embed_dim, (self.depthwise_kernel,), padding="SAME",
                    feature_group_count=self.embed_dim, use_bias=False,
                    dtype=self.dtype, name="conv_dw")(h)
        # training uses batch statistics and updates the running stats —
        # callers must apply with mutable=["batch_stats"] then (same
        # contract as NPC's ConvBlocks, task/reconstruction.py:133-148);
        # inference normalizes with the checkpoint's running stats
        h = nn.BatchNorm(use_running_average=deterministic, name="conv_bn")(h)
        h = nn.silu(h)
        h = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype, name="conv_pw2")(h)
        x = x + drop(h)

        x = 0.5 * ffn(x, "ffn2") + x
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_layer_norm")(x).astype(self.dtype)
