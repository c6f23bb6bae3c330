"""Interleaved on-chip A/B: static vs dynamic activation scales in the
whole-block attention kernel, at the ENCODER-STAGE level with the real
serving artifacts (hub-materialized qcache: cached int8 weights + calibrated
per-layer act scales).

bench.py's end-to-end marginal timing has ~0.3% run-to-run spread, which
masks the ~2% kernel-level win the interleaved per-layer probe measured
(tools/exp_encoder_tiles.py attn_static 0.891 vs attn_v16 0.949 ms/layer).
This harness isolates the 24L encoder and alternates the two compiled
programs inside one process so drift cancels.

Usage: python tools/exp_static_act_ab.py   (needs the TPU)
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
SECS = float(os.environ.get("BENCH_SECS", 10.0))
ITERS = int(os.environ.get("BENCH_ITERS", 10))
REPS = int(os.environ.get("REPS", 5))
T_FEAT = (int(16000 * SECS) - 400) // 320 + 1


def main():
    import s3prl_tpu.models.transformer as tr
    from s3prl_tpu import hub
    from s3prl_tpu.models.transformer import TransformerEncoder

    up = hub.load("hubert_large_ll60k", quantize=True)
    p_enc = up.params["params"]["encoder"]
    q_enc = up.params["qcache"]["encoder"]
    mod = TransformerEncoder(
        embed_dim=1024, ffn_dim=4096, num_layers=24, num_heads=16,
        layer_norm_first=True, dropout=0.0, attention_dropout=0.0,
        use_flash=True, quantize=True, dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T_FEAT, 1024).astype(np.float32), jnp.bfloat16)
    vars_ = {"params": p_enc, "qcache": q_enc}

    def make(static: bool):
        orig = tr._static_act_enabled
        tr._static_act_enabled = lambda: static
        try:
            @jax.jit
            def loop(v, x):
                def body(i, carry):
                    h, acc = carry
                    _, hs = mod.apply(v, h)
                    dep = 0.0 * hs[-1, :, :1, :1].astype(h.dtype).mean(
                        -1, keepdims=True)
                    return (h + dep, acc + hs[-1, 0, 0, 0].astype(jnp.float32))

                _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))
                return acc

            float(loop(vars_, x))  # compile + run while patched (host fetch
            # forces execution; block_until_ready lies on the axon tunnel)
        finally:
            tr._static_act_enabled = orig
        return loop

    loop_on = make(True)
    loop_off = make(False)

    best = {"static": float("inf"), "dynamic": float("inf")}
    for rep in range(REPS):
        for name, fn in (("static", loop_on), ("dynamic", loop_off)):
            t0 = time.perf_counter()
            float(fn(vars_, x))  # scalar fetch = real synchronization
            ms = (time.perf_counter() - t0) * 1e3 / ITERS
            best[name] = min(best[name], ms)
            print(json.dumps({"rep": rep, "variant": name,
                              "ms_per_iter": round(ms, 3)}), flush=True)
    print(json.dumps({"best": {k: round(v, 3) for k, v in best.items()},
                      "delta_ms": round(best["dynamic"] - best["static"], 3)}))


if __name__ == "__main__":
    main()
