"""Cast-free int8 MXU roof probe (round-3, addresses VERDICT weak #1).

Round 2 measured "179 TOP/s int8" with a dependent GEMM chain whose timed
loop requantized int32->int8 between GEMMs (tools/bench_int8.py:48-53), i.e.
GEMM+requant, not the MXU roof. This probe removes every cast from the
measured work:

  probe A  independent int8 GEMMs, full int32 outputs materialized to HBM.
           No inter-GEMM dependency, no VPU work, no DCE possible (outputs
           are returned whole). Upper bound for XLA-emitted int8 GEMM.
  probe B  same GEMMs with a fused requant epilogue (scale-mul + clip +
           int8 store), isolating the epilogue cost vs probe A.
  probe C  Pallas/Mosaic int8 GEMM with explicit (BM,BK,BN) tiling and an
           int32 VMEM accumulator; K-loop innermost via grid; int8 store
           once at the end. Checks whether hand tiling beats XLA.
  probe D  bf16 control at the same shape (sanity: should be ~166 TF/s as
           measured in round 2, PARITY.md).

One JSON line per case: {"case", "ms", "tops"} where tops counts only GEMM
FLOPs (2*M*K*N per GEMM).
"""

import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = int(os.environ.get("REPS", 3))


def _fetch(out):
    """Force completion via a tiny host transfer: on the tunneled axon
    platform block_until_ready returns without waiting for remote execution
    (measured: 4x8192^3 GEMMs "in" 50us), but a host fetch of any element
    orders after the producing program."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf[(0,) * leaf.ndim]))


def _time(fn, *args):
    _fetch(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _marginal(make_run, make_args, flops_per_stream, s_lo, s_hi, case):
    """Time at two stream counts; the marginal rate (extra work / extra time)
    cancels the tunnel's constant per-call round-trip latency."""
    dts = {}
    for s in (s_lo, s_hi):
        dts[s] = _time(make_run(), *make_args(s))
    dflops = (s_hi - s_lo) * flops_per_stream
    ddt = dts[s_hi] - dts[s_lo]
    rate = dflops / max(ddt, 1e-9) / 1e12
    print(json.dumps({"case": case,
                      "ms_lo": round(dts[s_lo] * 1e3, 2),
                      "ms_hi": round(dts[s_hi] * 1e3, 2),
                      "marginal_tops": round(rate, 1)}), flush=True)
    return rate


def _dev_int8(key, shape):
    """Generate int8 test data ON DEVICE (a host->device transfer of a
    512MB operand over the tunnel takes minutes)."""
    x = jax.jit(
        lambda k: jax.random.randint(k, shape, -127, 128, jnp.int32).astype(jnp.int8)
    )(key)
    _fetch(x)
    return x


def _dev_bf16(key, shape):
    x = jax.jit(lambda k: jax.random.normal(k, shape, jnp.bfloat16) * 0.1)(key)
    _fetch(x)
    return x


def probe_xla_int32out(M, K, N, s_lo=2, s_hi=8, tag=""):
    """Independent int8 GEMMs -> full int32 outputs. Zero casts in the loop."""
    W = _dev_int8(jax.random.key(0), (K, N))

    def make_args(s):
        X = _dev_int8(jax.random.key(s), (s, M, K))
        return (X, W)

    def make_run():
        @jax.jit
        def run(X, W):
            return jax.lax.map(
                lambda x: jax.lax.dot_general(
                    x, W, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
                ),
                X,
            )

        return run

    return _marginal(make_run, make_args, 2 * M * K * N, s_lo, s_hi,
                     f"A_xla_i32out_{M}x{K}x{N}{tag}")


def probe_xla_requant(M, K, N, s_lo=2, s_hi=8, tag=""):
    """Same GEMMs + fused requant epilogue -> int8 outputs."""
    W = _dev_int8(jax.random.key(0), (K, N))
    scale = jnp.float32(1.0 / 1024.0)

    def make_args(s):
        X = _dev_int8(jax.random.key(s), (s, M, K))
        return (X, W)

    def make_run():
        @jax.jit
        def run(X, W):
            def one(x):
                a = jax.lax.dot_general(
                    x, W, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
                )
                return jnp.clip(
                    jnp.round(a.astype(jnp.float32) * scale), -127, 127
                ).astype(jnp.int8)

            return jax.lax.map(one, X)

        return run

    return _marginal(make_run, make_args, 2 * M * K * N, s_lo, s_hi,
                     f"B_xla_requant_{M}x{K}x{N}{tag}")


def probe_bf16(M, K, N, s_lo=2, s_hi=8, tag=""):
    W = _dev_bf16(jax.random.key(0), (K, N))

    def make_args(s):
        X = _dev_bf16(jax.random.key(s), (s, M, K))
        return (X, W)

    def make_run():
        @jax.jit
        def run(X, W):
            return jax.lax.map(
                lambda x: jax.lax.dot_general(
                    x, W, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16),
                X,
            )

        return run

    return _marginal(make_run, make_args, 2 * M * K * N, s_lo, s_hi,
                     f"D_bf16_{M}x{K}x{N}{tag}")


def _mm_kernel(x_ref, w_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.int8)


def pallas_int8_mm(x, w, bm=512, bk=1024, bn=512):
    M, K = x.shape
    _, N = w.shape
    n_k = K // bk
    return pl.pallas_call(
        functools.partial(_mm_kernel, n_k=n_k),
        grid=(M // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w)


def probe_pallas(M, K, N, bm, bk, bn, s_lo=2, s_hi=8, tag=""):
    W = _dev_int8(jax.random.key(0), (K, N))

    def make_args(s):
        X = _dev_int8(jax.random.key(s), (s, M, K))
        return (X, W)

    def make_run():
        @jax.jit
        def run(X, W):
            return jax.lax.map(lambda x: pallas_int8_mm(x, W, bm, bk, bn), X)

        return run

    try:
        return _marginal(make_run, make_args, 2 * M * K * N, s_lo, s_hi,
                         f"C_pallas_{M}x{K}x{N}_b{bm}.{bk}.{bn}{tag}")
    except Exception as e:  # noqa: BLE001 — report failed tile configs, keep sweeping
        print(json.dumps({"case": f"C_pallas_{M}x{K}x{N}_b{bm}.{bk}.{bn}{tag}",
                          "error": str(e)[:200]}), flush=True)
        return 0.0


if __name__ == "__main__":
    phase = os.environ.get("PHASE", "xla")
    if phase == "xla":
        # square ceiling + the serving shapes (HuBERT-Large fc1 at B=32)
        probe_xla_int32out(8192, 8192, 8192, tag="-sq")
        probe_bf16(8192, 8192, 8192, tag="-sq")
        probe_xla_requant(8192, 8192, 8192, tag="-sq")
        probe_xla_int32out(15968, 1024, 4096, tag="-fc1")
        probe_xla_requant(15968, 1024, 4096, tag="-fc1")
    elif phase == "pallas":
        for bm, bk, bn in [(512, 1024, 512), (256, 1024, 1024),
                           (512, 512, 1024), (1024, 1024, 256),
                           (512, 2048, 512), (256, 2048, 512)]:
            probe_pallas(8192, 8192, 8192, bm, bk, bn, tag="-sq")
    elif phase == "pallas-fc1":
        for bm, bk, bn in [(512, 1024, 512), (998, 1024, 512),
                           (1024, 1024, 512), (512, 1024, 1024)]:
            M = 15968 if 15968 % bm == 0 else (15968 // bm) * bm
            probe_pallas(M, 1024, 4096, bm, bk, bn, tag="-fc1")
