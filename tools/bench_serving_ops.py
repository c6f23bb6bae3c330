"""Per-op attribution for the int8 serving encoder at HuBERT-Large shapes.

Times each serving-path op in dependent-chain style (op output feeds the
next iteration) with the marginal-iters trick to cancel tunnel latency:
run the on-device fori_loop at two iteration counts and report
(extra time) / (extra iters).

Ops (env OPS=comma list):
  roof_qkv      int8 GEMM [M,1024]x[1024,3072] int32-out (the ceiling)
  xla_qkv       ops/quant.int8_matmul at qkv shape (quantize+dot+dequant)
  pallas_qkv    kernels/ffn.fused_int8_linear at qkv shape (LN folded)
  pallas_ffn    kernels/ffn.fused_int8_ffn (LN + residual folded)
  xla_ln        bare f32 LayerNorm over [M, C] (the unfused pre-pass)
  attn          kernels/flash_attention.fused_qkv_attention at B=32,T=499
  attn_outproj  fused_qkv_attention_outproj (attention + int8 out_proj)

Prints one JSON line per op: {"op", "ms", "tflops_or_tops"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("BENCH_BATCH", 32))
T = 499  # 10 s @ stride 320
C, FFN, H = 1024, 4096, 16
M = B * T
DT = jnp.bfloat16
IT_LO, IT_HI = 4, 12


def _fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(np.asarray(leaf.reshape(-1)[0]))


def _dev(key, shape, dtype=DT, scale=0.5):
    x = jax.jit(lambda k: jax.random.normal(k, shape, jnp.float32) * scale)(key)
    x = jax.jit(lambda v: v.astype(dtype))(x)
    _fetch(x)
    return x


def marginal_time(make_loop, *args):
    """make_loop(iters) -> jitted fn(*args) returning a scalar-ish dep."""
    times = {}
    for it in (IT_LO, IT_HI):
        fn = make_loop(it)
        _fetch(fn(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _fetch(fn(*args))
            best = min(best, time.perf_counter() - t0)
        times[it] = best
    return (times[IT_HI] - times[IT_LO]) / (IT_HI - IT_LO)


def report(op, dt, flops):
    print(json.dumps({"op": op, "ms": round(dt * 1e3, 3),
                      "tops": round(flops / dt / 1e12, 1)}), flush=True)


def dep_loop(step, x0):
    """Dependent chain: each iteration's input is perturbed by the previous
    output's mean (scalar — negligible work, real dependency)."""

    def make(iters):
        @jax.jit
        def run(x):
            def body(i, carry):
                x, acc = carry
                y = step(x)
                s = y.astype(jnp.float32).mean()
                return (x + (0.0 * s).astype(x.dtype), acc + s)

            return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))[1]

        return run

    return make


def main():
    ops = os.environ.get(
        "OPS", "roof_qkv,xla_qkv,pallas_qkv,pallas_ffn,xla_ln,attn,attn_outproj"
    ).split(",")
    key = jax.random.key(0)

    x = _dev(key, (B, T, C))
    x2d = _dev(key, (M, C))

    if "roof_qkv" in ops:
        x8 = jax.jit(lambda v: jnp.clip(jnp.round(v.astype(jnp.float32) * 64), -127, 127).astype(jnp.int8))(x2d)
        w8 = jax.jit(lambda k: jax.random.randint(k, (C, 3 * C), -127, 128, jnp.int32).astype(jnp.int8))(key)
        _fetch(x8); _fetch(w8)

        def step(v):
            return jax.lax.dot_general(v, w8, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)

        # dependency via scalar; input stays the same int8 buffer
        dt = marginal_time(dep_loop(step, x8), x8)
        report("roof_qkv_i32out", dt, 2 * M * C * 3 * C)

    if "xla_qkv" in ops:
        from s3prl_tpu.ops.quant import int8_matmul

        w = _dev(jax.random.key(1), (C, 3 * C), jnp.float32, 0.02)
        b = _dev(jax.random.key(2), (3 * C,), jnp.float32, 0.01)

        def step(v):
            return int8_matmul(v, w, b, out_dtype=DT)

        dt = marginal_time(dep_loop(step, x2d), x2d)
        report("xla_qkv_quantdense", dt, 2 * M * C * 3 * C)

    if "pallas_qkv" in ops:
        from s3prl_tpu.kernels.ffn import fused_int8_linear

        w = _dev(jax.random.key(1), (C, 3 * C), jnp.float32, 0.02)
        b = _dev(jax.random.key(2), (3 * C,), jnp.float32, 0.01)
        g = jnp.ones((C,), jnp.float32)
        be = jnp.zeros((C,), jnp.float32)

        def step(v):
            return fused_int8_linear(v, w, b, ln=(g, be))

        dt = marginal_time(dep_loop(step, x), x)
        report("pallas_qkv_lnfused", dt, 2 * M * C * 3 * C)

    if "pallas_ffn" in ops:
        from s3prl_tpu.kernels.ffn import fused_int8_ffn

        w1 = _dev(jax.random.key(3), (C, FFN), jnp.float32, 0.02)
        b1 = _dev(jax.random.key(4), (FFN,), jnp.float32, 0.01)
        w2 = _dev(jax.random.key(5), (FFN, C), jnp.float32, 0.02)
        b2 = _dev(jax.random.key(6), (C,), jnp.float32, 0.01)
        g = jnp.ones((C,), jnp.float32)
        be = jnp.zeros((C,), jnp.float32)

        def step(v):
            return fused_int8_ffn(v, w1, b1, w2, b2, ln=(g, be), residual=True)

        dt = marginal_time(dep_loop(step, x), x)
        report("pallas_ffn_full", dt, 2 * M * C * FFN * 2)

    if "xla_ln" in ops:
        def step(v):
            m = v.astype(jnp.float32)
            mu = m.mean(-1, keepdims=True)
            var = ((m - mu) ** 2).mean(-1, keepdims=True)
            return ((m - mu) * jax.lax.rsqrt(var + 1e-5)).astype(DT)

        dt = marginal_time(dep_loop(step, x2d), x2d)
        report("xla_layernorm", dt, 0.0)

    if "attn" in ops:
        from s3prl_tpu.kernels.flash_attention import fused_qkv_attention

        qkv = _dev(jax.random.key(7), (B, T, 3 * C))
        lens = jnp.full((B,), T, jnp.int32)

        def step(v):
            return fused_qkv_attention(v, lens, H)

        dt = marginal_time(dep_loop(step, qkv), qkv)
        report("flash_attention", dt, 2 * 2 * B * H * T * T * (C // H))

    if "attn_outproj" in ops:
        from s3prl_tpu.kernels.flash_attention import fused_qkv_attention_outproj

        qkv = _dev(jax.random.key(7), (B, T, 3 * C))
        res = _dev(jax.random.key(8), (B, T, C))
        ko = _dev(jax.random.key(9), (C, C), jnp.float32, 0.02)
        bo = _dev(jax.random.key(10), (C,), jnp.float32, 0.01)
        lens = jnp.full((B,), T, jnp.int32)

        def step(v):
            return fused_qkv_attention_outproj(v, res, ko, bo, lens, H)

        dt = marginal_time(dep_loop(step, qkv), qkv)
        report("attn_plus_outproj", dt,
               2 * 2 * B * H * T * T * (C // H) + 2 * M * C * C)


if __name__ == "__main__":
    main()
