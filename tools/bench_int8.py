"""int8 vs bf16 matmul rate probe at the encoder's GEMM shapes.

Verifies the v5e double-rate int8 MXU path before wiring the quantized
serving mode. One JSON line per case.
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

ITERS = 10
M = int(os.environ.get("M", 63872))  # B=128 x T=499
C, FFN = 1024, 4096


def timeit(fn, *args):
    out = fn(*args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    float(np.asarray(fn(*args)))
    return (time.perf_counter() - t0) / ITERS


def bench_chain(dtype_name):
    rng = np.random.RandomState(0)
    if dtype_name == "int8":
        x = jnp.asarray(rng.randint(-127, 127, (M, C)), jnp.int8)
        w1 = jnp.asarray(rng.randint(-127, 127, (C, FFN)), jnp.int8)
        w2 = jnp.asarray(rng.randint(-127, 127, (FFN, C)), jnp.int8)

        @jax.jit
        def loop(x):
            def body(carry, _):
                h, acc = carry
                a = jax.lax.dot_general(h, w1, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                a8 = jnp.clip(a >> 8, -127, 127).astype(jnp.int8)
                b = jax.lax.dot_general(a8, w2, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                b8 = jnp.clip(b >> 8, -127, 127).astype(jnp.int8)
                return (b8, acc + b[0, 0]), None

            (h, acc), _ = jax.lax.scan(body, (x, jnp.int32(0)), None, length=ITERS)
            return acc

        ms = timeit(loop, x)
    else:
        dt = jnp.bfloat16
        x = jnp.asarray(rng.randn(M, C).astype(np.float32), dt)
        w1 = jnp.asarray(rng.randn(C, FFN).astype(np.float32) * 0.02, dt)
        w2 = jnp.asarray(rng.randn(FFN, C).astype(np.float32) * 0.02, dt)

        @jax.jit
        def loop(x):
            def body(carry, _):
                h, acc = carry
                a = (h @ w1).astype(dt)
                b = (a @ w2).astype(dt)
                return (b * jnp.bfloat16(1e-3), acc + b[0, 0].astype(jnp.float32)), None

            (h, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), None, length=ITERS)
            return acc

        ms = timeit(loop, x)
    flops = 2 * M * (C * FFN + FFN * C)
    print(json.dumps({"case": f"chain_{dtype_name}", "ms": round(ms * 1e3, 2),
                      "tops": round(flops / ms / 1e12, 1)}), flush=True)


def bench_quant_dense():
    """The full dynamic-quant path (quantize acts + weights in-graph)."""
    from s3prl_tpu.ops.quant import int8_matmul

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, C).astype(np.float32), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(C, FFN).astype(np.float32) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(FFN, C).astype(np.float32) * 0.02, jnp.bfloat16)

    @jax.jit
    def loop(x):
        def body(carry, _):
            h, acc = carry
            a = int8_matmul(h, w1)
            b = int8_matmul(a, w2)
            return (b * jnp.bfloat16(1e-3), acc + b[0, 0].astype(jnp.float32)), None

        (h, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), None, length=ITERS)
        return acc

    ms = timeit(loop, x)
    flops = 2 * M * (C * FFN + FFN * C)
    print(json.dumps({"case": "chain_quant_dense", "ms": round(ms * 1e3, 2),
                      "tops": round(flops / ms / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    for case in os.environ.get("CASES", "chain_bf16,chain_int8,chain_quant").split(","):
        if case == "chain_bf16":
            bench_chain("bf16")
        elif case == "chain_int8":
            bench_chain("int8")
        elif case == "chain_quant":
            bench_quant_dense()
