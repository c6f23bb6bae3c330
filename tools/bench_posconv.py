"""Posconv A/B on the serving shapes: XLA grouped conv vs Pallas kernels.

The conv positional embedding ([B=32, T=499, C=1024], k=128, groups=16 +
GELU) costs 7 ms of the 72.7 ms serving path at XLA's 38-53 TF/s grouped
lowering (PARITY.md). Cases:
- xla: nn.Conv-equivalent lax grouped conv + exact/tanh GELU
- pallas_bf16: kernels/posconv.pos_conv_gelu (long-K im2col GEMMs in VMEM)
- pallas_int8: pos_conv_gelu_q8 (per-window activation scale, int8 MXU)

One JSON line per case: {"case", "ms", "tflops"} + a cosine-vs-f32 quality
line for the quantized variant. Marginal-fori_loop timing (see
tools/bench_components.py for why host timing needs this on the tunnel).
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

from s3prl_tpu.kernels.posconv import pos_conv_gelu, pos_conv_gelu_q8

B = int(os.environ.get("BENCH_BATCH", 32))
T = int(os.environ.get("BENCH_T", 499))
C, K, G = 1024, 128, 16
LO, HI = 8, 40
GELU = os.environ.get("S3PRL_GELU", "tanh")


def _fetch(x):
    float(np.asarray(x.reshape(-1)[0]))


def _marginal(fn, *args):
    def chain(n):
        @jax.jit
        def run(*a):
            def body(i, c):
                y = fn(*c[:-1])
                v = y.reshape(-1)[0].astype(jnp.float32)
                return ((c[0] + (0.0 * v).astype(c[0].dtype),) + c[1:-1]
                        + (c[-1] + v,))

            return jax.lax.fori_loop(0, n, body, a + (jnp.float32(0),))[-1:][0]

        return run

    run_lo, run_hi = chain(LO), chain(HI)
    _fetch(run_lo(*args)); _fetch(run_hi(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); _fetch(run_lo(*args)); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); _fetch(run_hi(*args)); t_hi = time.perf_counter() - t0
        m = (t_hi - t_lo) / (HI - LO)
        if m > 0:
            best = min(best, m)
    return best


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32), jnp.bfloat16)
    kern = jnp.asarray(rng.randn(K, C // G, C).astype(np.float32) * 0.02)
    bias = jnp.asarray(rng.randn(C).astype(np.float32) * 0.01)
    flops = 2 * B * T * K * (C // G) * C

    import flax.linen as nn

    def xla_case(x):
        pad = K // 2
        y = jax.lax.conv_general_dilated(
            x, kern.astype(x.dtype), (1,), ((pad, pad),),
            feature_group_count=G, dimension_numbers=("NWC", "WIO", "NWC"))
        y = y[:, :-1, :] + bias.astype(x.dtype)
        return nn.gelu(y, approximate=(GELU == "tanh")).astype(x.dtype)

    def pallas_bf16(x):
        return pos_conv_gelu(x, kern, bias, groups=G, gelu_mode=GELU)

    def pallas_int8(x):
        return pos_conv_gelu_q8(x, kern, bias, groups=G, gelu_mode=GELU)

    # quality gate for the quantized variant (vs fp32 XLA reference); a
    # lowering failure in one Pallas case must not kill the other cases
    ref = np.asarray(xla_case(x.astype(jnp.float32))).astype(np.float64)
    for name, fn in [("pallas_bf16", pallas_bf16), ("pallas_int8", pallas_int8)]:
        try:
            y = np.asarray(fn(x)).astype(np.float64)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": f"{name}_cosine_vs_f32",
                              "error": str(e).splitlines()[0][:200]}), flush=True)
            continue
        cos = float(
            (ref * y).sum() / np.sqrt((ref**2).sum() * (y**2).sum()))
        print(json.dumps({"case": f"{name}_cosine_vs_f32", "cosine": round(cos, 6)}),
              flush=True)

    for name, fn in [("xla", xla_case), ("pallas_bf16", pallas_bf16),
                     ("pallas_int8", pallas_int8)]:
        try:
            s = _marginal(fn, x)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": name,
                              "error": str(e).splitlines()[0][:200]}), flush=True)
            continue
        print(json.dumps({"case": name, "ms": round(s * 1e3, 3),
                          "tflops": round(flops / s / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
