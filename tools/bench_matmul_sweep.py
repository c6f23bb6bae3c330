"""GEMM shape sweep: find where the chip's matmul throughput actually is.

The encoder runs at the same TFLOP/s as a bare GEMM chain at its own shapes
(tools/bench_components.py), so encoder speed == GEMM speed at
[B*T, 1024] x [1024, {1024,3072,4096}]. This sweep measures isolated GEMMs
across M/K/N and dtypes to locate the gap vs the square-matmul ceiling.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("BENCH_ITERS", 20))


def bench_gemm(M, K, N, dtype=jnp.bfloat16, acc=None, tag=""):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, K).astype(np.float32) * 0.1, dtype)
    w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.1, dtype)
    wb = jnp.asarray(rng.randn(N, K).astype(np.float32) * 0.1, dtype)

    @jax.jit
    def loop(x, w, wb):  # weights as args, NOT closure constants (the remote
        # compiler rejects HLO with >100MB embedded constants)
        def body(i, h):
            y = jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())),
                preferred_element_type=acc,
            )
            # project back to [M, K] so the loop carries a fixed shape;
            # counts as a second GEMM of the same class
            h2 = jax.lax.dot_general(
                y.astype(dtype), wb, (((1,), (0,)), ((), ())),
                preferred_element_type=acc,
            )
            return h2.astype(dtype)

        return jax.lax.fori_loop(0, ITERS, body, x)[0, 0].astype(jnp.float32)

    float(np.asarray(loop(x, w, wb)))  # compile+warm
    t0 = time.perf_counter()
    float(np.asarray(loop(x, w, wb)))
    dt = (time.perf_counter() - t0) / ITERS
    flops = 2 * 2 * M * K * N  # two GEMMs per iter
    print(
        json.dumps(
            {
                "gemm": f"{M}x{K}x{N}",
                "dtype": str(dtype.__name__ if hasattr(dtype, '__name__') else dtype),
                "acc": str(acc),
                "ms": round(dt * 1e3, 3),
                "tflops": round(flops / dt / 1e12, 1),
                "tag": tag,
            }
        ),
        flush=True,
    )


if __name__ == "__main__" and not os.environ.get("BENCH_PHASE"):
    # ceiling: big square
    bench_gemm(8192, 8192, 8192, tag="square-ceiling")
    bench_gemm(4096, 4096, 4096, tag="square")
    # model shapes (HuBERT-Large extraction, B=32 x T=499)
    bench_gemm(15968, 1024, 4096, tag="fc1-exact")
    bench_gemm(16384, 1024, 4096, tag="fc1-padM")
    bench_gemm(15968, 4096, 1024, tag="fc2-exact")
    bench_gemm(15968, 1024, 3072, tag="qkv-exact")
    bench_gemm(15968, 1024, 1024, tag="outproj-exact")
    # K sensitivity: is small K the limiter?
    bench_gemm(8192, 1024, 8192, tag="smallK")
    bench_gemm(8192, 2048, 4096, tag="midK")
    # accumulate dtype
    bench_gemm(15968, 1024, 4096, acc=jnp.float32, tag="fc1-f32acc")
    # fp32 comparison
    bench_gemm(8192, 1024, 4096, dtype=jnp.float32, tag="fc1-f32")

# appended: M-scaling study (run with BENCH_PHASE=mscale)
if os.environ.get("BENCH_PHASE") == "mscale":
    for M in (31936, 63872, 127744):
        bench_gemm(M, 1024, 4096, tag=f"fc1-M{M}")
    bench_gemm(63872, 1024, 1024, tag="outproj-M64k")
    bench_gemm(63872, 1024, 3072, tag="qkv-M64k")
    bench_gemm(63872, 4096, 1024, tag="fc2-M64k")
