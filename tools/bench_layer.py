"""Per-layer serving benchmark: the full EncoderLayer chained N times.

The dependency is the real one (layer output -> next layer input), so no
artificial consumption skews the numbers; marginal time between two chain
lengths cancels the tunnel round-trip. HuBERT-Large pre-LN layer at the
bench protocol shape (B=32, T=499, C=1024, FFN=4096, H=16).

Per-layer ideal at the measured 330 TOP/s int8 roof + 165 TF/s bf16 attn:
  GEMMs 4.03e11 / 330e12 = 1.22 ms, attention 3.3e10 / 165e12 = 0.20 ms
  -> ~1.5 ms/layer. Round-2 serving ran ~2.8 ms/layer.

Env: VARIANT=serving|full_fuse|bf16  S3PRL_BQF/S3PRL_FCHUNK/S3PRL_BQL knobs.
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
T = 499
C, FFN, H = 1024, 4096, 16
IT_LO, IT_HI = int(os.environ.get("IT_LO", 6)), int(os.environ.get("IT_HI", 24))
REPS = int(os.environ.get("REPS", 3))

LAYER_GEMM_FLOPS = 2 * B * T * C * (3 * C + C + FFN + FFN)
LAYER_ATTN_FLOPS = 2 * 2 * B * H * T * T * (C // H)


def _fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(np.asarray(leaf.reshape(-1)[0]))


def main():
    variant = os.environ.get("VARIANT", "serving")
    quantize = variant != "bf16"
    if variant == "full_fuse":
        os.environ["S3PRL_FULL_FUSE"] = "1"

    from s3prl_tpu.models.transformer import EncoderLayer

    layer = EncoderLayer(
        embed_dim=C, ffn_dim=FFN, num_heads=H, layer_norm_first=True,
        dropout=0.0, attention_dropout=0.0, activation="gelu",
        dtype=jnp.bfloat16, use_flash=True, quantize=quantize,
    )
    key = jax.random.key(0)
    x0 = jax.jit(lambda k: jax.random.normal(k, (B, T, C), jnp.bfloat16) * 0.5)(key)
    params = layer.init(jax.random.key(1), x0, None)["params"]
    params = jax.device_put(params)
    _fetch(x0)

    if variant in ("attn_only", "ffn_only", "attn_block", "serving_block"):
        # decomposition: chain ONLY the attention block (LN + int8 qkv +
        # fused attention/out-proj/residual) or ONLY the FFN block (fused
        # LN+fc1+GELU+fc2+residual) — both are [B,T,C]->[B,T,C]
        import flax.linen as fnn
        from s3prl_tpu.kernels.ffn import fused_int8_ffn
        from s3prl_tpu.kernels.flash_attention import fused_qkv_attention_outproj
        from s3prl_tpu.ops.quant import int8_matmul

        p = params

        def attn_block(x):
            h = fnn.LayerNorm(epsilon=1e-5, dtype=jnp.float32).apply(
                {"params": p["self_attn_layer_norm"]}, x).astype(jnp.bfloat16)
            qkv = int8_matmul(h, p["self_attn"]["qkv"]["kernel"],
                              p["self_attn"]["qkv"]["bias"], out_dtype=jnp.bfloat16)
            kv_lens = jnp.full((B,), T, jnp.int32)
            return fused_qkv_attention_outproj(
                qkv, x, p["self_attn"]["out_proj"]["kernel"],
                p["self_attn"]["out_proj"]["bias"], kv_lens, H)

        def ffn_block(x):
            return fused_int8_ffn(
                x, p["fc1"]["kernel"], p["fc1"]["bias"],
                p["fc2"]["kernel"], p["fc2"]["bias"],
                ln=(p["final_layer_norm"]["scale"], p["final_layer_norm"]["bias"]),
                residual=True)

        from s3prl_tpu.kernels.flash_attention import fused_attention_block

        def attn_block_fused(x):
            return fused_attention_block(
                x, p["self_attn"]["qkv"]["kernel"], p["self_attn"]["qkv"]["bias"],
                (p["self_attn_layer_norm"]["scale"], p["self_attn_layer_norm"]["bias"]),
                p["self_attn"]["out_proj"]["kernel"], p["self_attn"]["out_proj"]["bias"],
                jnp.full((B,), T, jnp.int32), H)

        block = {
            "attn_only": attn_block,
            "ffn_only": ffn_block,
            "attn_block": attn_block_fused,
            "serving_block": lambda x: ffn_block(attn_block_fused(x)),
        }[variant]

        def make(iters):
            @jax.jit
            def run(params, x):
                return jax.lax.fori_loop(0, iters, lambda i, h: block(h), x)

            return run
    else:
        def make(iters):
            @jax.jit
            def run(params, x):
                def body(i, h):
                    return layer.apply({"params": params}, h, None)

                return jax.lax.fori_loop(0, iters, body, x)

            return run

    times = {}
    for it in (IT_LO, IT_HI):
        fn = make(it)
        _fetch(fn(params, x0))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            _fetch(fn(params, x0))
            best = min(best, time.perf_counter() - t0)
        times[it] = best

    per_layer = (times[IT_HI] - times[IT_LO]) / (IT_HI - IT_LO)
    print(json.dumps({
        "variant": variant,
        "knobs": {k: os.environ.get(k) for k in
                  ("S3PRL_BQF", "S3PRL_FCHUNK", "S3PRL_BQL", "S3PRL_FULL_FUSE")
                  if os.environ.get(k)},
        "ms_per_layer": round(per_layer * 1e3, 3),
        "gemm_tops_effective": round(LAYER_GEMM_FLOPS / per_layer / 1e12, 1),
        "encoder24_ms": round(per_layer * 24 * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
