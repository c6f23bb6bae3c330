"""Per-stage conv front-end decomposition on the serving protocol.

Times each stage of the HuBERT-Large conv extractor (B=32, 10 s) in
isolation — conv0 fused kernel, then each XLA mid conv + LN + GELU — plus
the full chain, via the marginal-fori_loop protocol (two chain lengths,
host-fetch sync; see tools/bench_components.py for why host timing needs
this on the axon tunnel).

Also A/Bs the Pallas fused mid-conv kernel (fused_conv_ln_gelu) per stage
against the XLA lowering, with S3PRL_GELU controlling the GELU variant.

One JSON line per case: {"case", "ms", "tflops", "gbps"}.
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3prl_tpu.kernels.conv_frontend import conv0_ln_gelu, fused_conv_ln_gelu

B = int(os.environ.get("BENCH_BATCH", 32))
SECS = float(os.environ.get("BENCH_SECS", 10.0))
LO, HI = 6, 18
GELU_TANH = os.environ.get("S3PRL_GELU", "tanh") == "tanh"

# HuBERT-Large conv stack (dim, k, stride)
LAYERS = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2


def _fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(np.asarray(leaf[(0,) * leaf.ndim]))


def _marginal(fn, *args):
    """Best-of-3 marginal seconds per iteration between chains of LO and HI."""

    def chain(n):
        @jax.jit
        def run(*a):
            def body(i, c):
                y = fn(*c[:-1])
                leaf = jax.tree_util.tree_leaves(y)[0]
                v = leaf.reshape(-1)[0].astype(jnp.float32)
                # dep chains iterations; acc makes the loop result live
                return ((c[0] + (0.0 * v).astype(c[0].dtype),)
                        + c[1:-1] + (c[-1] + v,))

            return jax.lax.fori_loop(0, n, body, a + (jnp.float32(0),))[-1]

        return run

    run_lo, run_hi = chain(LO), chain(HI)
    _fetch(run_lo(*args)); _fetch(run_hi(*args))  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); _fetch(run_lo(*args)); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); _fetch(run_hi(*args)); t_hi = time.perf_counter() - t0
        m = (t_hi - t_lo) / (HI - LO)
        if m > 0:
            best = min(best, m)
    return best


def emit(case, secs, flops, bytes_):
    print(json.dumps({
        "case": case, "ms": round(secs * 1e3, 2),
        "tflops": round(flops / secs / 1e12, 1),
        "gbps": round(bytes_ / secs / 1e9, 1),
    }), flush=True)


def main():
    rng = np.random.RandomState(0)
    T = int(16000 * SECS)
    wavs = jnp.asarray(rng.randn(B, T).astype(np.float32))

    # conv0 fused kernel
    k0 = jnp.asarray(rng.randn(10, 1, 512).astype(np.float32) * 0.05)
    g = jnp.ones((512,), jnp.float32)
    b = jnp.zeros((512,), jnp.float32)
    T0 = (T - 10) // 5 + 1
    mode = "tanh" if GELU_TANH else None
    f0 = functools.partial(conv0_ln_gelu, stride=5, k=10, gelu_mode=mode)
    s = _marginal(lambda w: f0(w.astype(jnp.bfloat16), k0, g, b), wavs)
    emit("conv0_fused", s, 2 * B * T0 * 10 * 512, B * T * 4 + B * T0 * 512 * 2)

    # each mid stage: XLA conv+LN+GELU vs Pallas fused kernel
    t_in = T0
    for i, (dim, k, st) in enumerate(LAYERS[1:], start=1):
        t_out = (t_in - k) // st + 1
        x = jnp.asarray(rng.randn(B, t_in, 512).astype(np.float32) * 0.5,
                        jnp.bfloat16)
        ki = jnp.asarray(rng.randn(k, 512, dim).astype(np.float32) * 0.03)
        flops = 2 * B * t_out * k * 512 * dim
        bytes_ = (B * t_in * 512 + B * t_out * dim) * 2

        def xla_stage(x, ki=ki, dim=dim, k=k, st=st):
            y = jax.lax.conv_general_dilated(
                x, ki.astype(x.dtype), (st,), "VALID",
                dimension_numbers=("NWC", "WIO", "NWC"))
            mean = jnp.mean(y.astype(jnp.float32), -1, keepdims=True)
            var = jnp.var(y.astype(jnp.float32), -1, keepdims=True)
            yn = (y.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
            return nn.gelu(yn, approximate=GELU_TANH).astype(x.dtype)

        def im2col_stage(x, ki=ki, dim=dim, k=k, st=st):
            # patches + ONE [B*T', C*k] @ [C*k, dim] GEMM (the lowering
            # _Im2ColConvGeneral uses), LN+GELU epilogue left to XLA fusion
            patches = jax.lax.conv_general_dilated_patches(
                jnp.transpose(x, (0, 2, 1)), (k,), (st,), "VALID")  # [B,C*k,T']
            w = ki.astype(x.dtype).transpose(1, 0, 2).reshape(512 * k, dim)
            y = jnp.einsum("bft,fo->bto", patches, w)
            yn = (y.astype(jnp.float32)
                  - jnp.mean(y.astype(jnp.float32), -1, keepdims=True))
            yn = yn * jax.lax.rsqrt(
                jnp.var(y.astype(jnp.float32), -1, keepdims=True) + 1e-5)
            return nn.gelu(yn, approximate=GELU_TANH).astype(x.dtype)

        def pertap_stage(x, ki=ki, dim=dim, k=k, st=st):
            # k strided slices, each one [B,T',C] @ [C,dim] GEMM, accumulated
            t_o = (x.shape[1] - k) // st + 1
            y = None
            for t in range(k):
                xt = x[:, t : t + (t_o - 1) * st + 1 : st]
                part = jnp.einsum("btc,co->bto", xt, ki[t].astype(x.dtype))
                y = part if y is None else y + part
            yn = (y.astype(jnp.float32)
                  - jnp.mean(y.astype(jnp.float32), -1, keepdims=True))
            yn = yn * jax.lax.rsqrt(
                jnp.var(y.astype(jnp.float32), -1, keepdims=True) + 1e-5)
            return nn.gelu(yn, approximate=GELU_TANH).astype(x.dtype)

        def pair_stage(x, ki=ki, dim=dim, k=k, st=st):
            # stride-2 pair trick: x.reshape(B, T/2, 2C) is FREE and its rows
            # [x[2j] | x[2j+1]] feed taps 0+1 as ONE K=2C GEMM; only tap 2
            # (k=3) reads the shifted even column. No im2col copy for 2/3 of
            # the weight matrix.
            assert st == 2, st
            t_o = (x.shape[1] - k) // st + 1
            C = x.shape[2]
            need = 2 * t_o + 2  # one pair row beyond the last output
            xp = (jnp.pad(x, ((0, 0), (0, need - x.shape[1]), (0, 0)))
                  if x.shape[1] < need else x[:, :need])
            P = xp.reshape(x.shape[0], t_o + 1, 2 * C)
            w01 = ki[:2].astype(x.dtype).reshape(2 * C, dim)
            y = jnp.einsum("btc,co->bto", P[:, :t_o], w01)
            if k == 3:
                y = y + jnp.einsum(
                    "btc,co->bto", P[:, 1:, :C], ki[2].astype(x.dtype))
            yn = (y.astype(jnp.float32)
                  - jnp.mean(y.astype(jnp.float32), -1, keepdims=True))
            yn = yn * jax.lax.rsqrt(
                jnp.var(y.astype(jnp.float32), -1, keepdims=True) + 1e-5)
            return nn.gelu(yn, approximate=GELU_TANH).astype(x.dtype)

        s = _marginal(xla_stage, x)
        emit(f"xla_conv{i}_k{k}", s, flops, bytes_)
        s = _marginal(pair_stage, x)
        emit(f"pair_conv{i}_k{k}", s, flops, bytes_)
        s = _marginal(im2col_stage, x)
        emit(f"im2col_conv{i}_k{k}", s, flops, bytes_)
        s = _marginal(pertap_stage, x)
        emit(f"pertap_conv{i}_k{k}", s, flops, bytes_)

        interp = jax.default_backend() == "cpu"
        fk = functools.partial(fused_conv_ln_gelu, interpret=interp)
        s = _marginal(lambda x: fk(x, ki, g, b), x)
        emit(f"pallas_conv{i}_k{k}", s, flops, bytes_)
        t_in = t_out


if __name__ == "__main__":
    main()
