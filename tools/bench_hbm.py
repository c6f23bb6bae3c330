"""Effective HBM bandwidth probe (v5e spec: 819 GB/s).

Times elementwise passes (read N bytes + write N bytes) in an on-device
dependent fori_loop at two lengths; the marginal time per iteration gives
achieved bandwidth free of tunnel latency. Also times a f32->bf16 cast pass
and a row-reduction (read-only traffic).
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

IT_LO, IT_HI = 4, 16
REPS = 3


def _fetch(x):
    float(np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0]))


def marginal(make, *args):
    out = {}
    for it in (IT_LO, IT_HI):
        fn = make(it)
        _fetch(fn(*args))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            _fetch(fn(*args))
            best = min(best, time.perf_counter() - t0)
        out[it] = best
    return (out[IT_HI] - out[IT_LO]) / (IT_HI - IT_LO)


def main():
    M, N = 16384, 16384  # 512 MB bf16
    x = jax.jit(lambda k: jax.random.normal(k, (M, N), jnp.bfloat16))(jax.random.key(0))
    _fetch(x)
    nbytes = M * N * 2

    def make_add(iters):
        @jax.jit
        def run(x):
            def body(i, h):
                return h + jnp.bfloat16(1.0)

            return jax.lax.fori_loop(0, iters, body, x)

        return run

    dt = marginal(make_add, x)
    print(json.dumps({"case": "add1_bf16_512MB", "ms": round(dt * 1e3, 2),
                      "gbps_rw": round(2 * nbytes / dt / 1e9, 1)}), flush=True)

    def make_reduce(iters):
        @jax.jit
        def run(x):
            def body(i, carry):
                h, acc = carry
                return (h, acc + jnp.max(jnp.abs(h)).astype(jnp.float32))

            return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))[1]

        return run

    dt = marginal(make_reduce, x)
    print(json.dumps({"case": "absmax_reduce_512MB", "ms": round(dt * 1e3, 2),
                      "gbps_read": round(nbytes / dt / 1e9, 1)}), flush=True)

    # LN+GELU pass at the conv-layer shape (read+write bf16, f32 math)
    def make_lngelu(iters):
        @jax.jit
        def run(x):
            def body(i, h):
                m = h.astype(jnp.float32)
                mu = m.mean(-1, keepdims=True)
                var = ((m - mu) ** 2).mean(-1, keepdims=True)
                n = (m - mu) * jax.lax.rsqrt(var + 1e-5)
                return jax.nn.gelu(n, approximate=False).astype(h.dtype)

            return jax.lax.fori_loop(0, iters, body, x)

        return run

    dt = marginal(make_lngelu, x)
    print(json.dumps({"case": "ln_gelu_512MB", "ms": round(dt * 1e3, 2),
                      "gbps_rw": round(2 * nbytes / dt / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
