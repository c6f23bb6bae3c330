"""SUPERB-probe TRAINING throughput benchmark (the reference's workload).

The reference's headline use is 200k-step frozen-upstream probe training
(SURVEY §6, downstream/asr/config.yaml) — run_downstream.py spends ~95% of
its step in the frozen upstream forward (SURVEY §3.1 hot loop). This bench
measures full train-step throughput of the equivalent path here:

  frozen HuBERT-Large (int8 serving forward by default, BENCH_QUANT=0 for
  bf16) -> Featurizer weighted sum -> UtteranceLevel probe -> CE loss ->
  Adam update of the featurizer+head params.

Protocol note (round 3): the monolithic train-step program (upstream +
probe fwd/bwd in ONE jit) repeatedly kills the axon tunnel's remote-compile
service ("Broken pipe" after 30-55 min, rounds 2 and 3), while bench.py's
structurally-identical extraction program compiles in minutes. So the step
runs as TWO chained device programs — (1) the proven-compilable frozen
extraction, (2) the probe fwd/bwd/Adam on the extracted states — async-
dispatched back-to-back with a data dependency, which is exactly what the
step costs end-to-end (the probe is ~1% of FLOPs; the upstream backward is
dead under stop_gradient either way). Marginal time between two chain
lengths cancels tunnel RTT + dispatch (see tools/bench_components.py).

Prints one JSON line {"metric", "value", "unit"}.
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
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3prl_tpu import hub
from s3prl_tpu.nn.heads import UtteranceLevel
from s3prl_tpu.nn.upstream import UpstreamDownstreamModel

B = int(os.environ.get("BENCH_BATCH", 32))
SECS = float(os.environ.get("BENCH_SECS", 10.0))
ITERS = int(os.environ.get("BENCH_ITERS", 9))
NUM_CLASSES = 10


def main():
    quant = os.environ.get("BENCH_QUANT", "1") == "1"
    up = hub.load("hubert_large_ll60k", dtype=jnp.bfloat16, flash=True,
                  quantize=quant)

    T = int(16000 * SECS)
    rng = np.random.RandomState(0)
    wavs = jnp.asarray(rng.randn(B, T).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)
    labels = jnp.asarray(rng.randint(0, NUM_CLASSES, B), jnp.int32)

    model = UpstreamDownstreamModel(
        downstream=UtteranceLevel(NUM_CLASSES), num_layers=up.num_layers
    )
    hs_s, hl_s = jax.eval_shape(
        lambda w, l: up.apply_standardized(up.params, w, l), wavs, lens)
    tparams = jax.jit(
        lambda k: model.init(k, jnp.zeros(hs_s.shape, hs_s.dtype),
                             jnp.zeros(hl_s.shape, hl_s.dtype))["params"]
    )(jax.random.key(0))
    opt = optax.adam(1e-4)
    opt_state = opt.init(tparams)

    # program 1: the frozen upstream forward (bench.py's program)
    @jax.jit
    def extract(params, wavs, lens):
        return up.apply_standardized(params, wavs, lens)

    def loss_fn(tparams, hs, h_lens, labels):
        logits = model.apply({"params": tparams}, hs, h_lens)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        ).mean()

    # program 2: probe forward/backward/Adam over the extracted states
    @jax.jit
    def probe_step(tparams, opt_state, hs, h_lens, labels):
        loss, grads = jax.value_and_grad(loss_fn)(tparams, hs, h_lens, labels)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(tparams, updates), opt_state, loss

    def chain(n, tp, st, w):
        loss = None
        for _ in range(n):
            hs, h_lens = extract(up.params, w, lens)
            tp, st, loss = probe_step(tp, st, hs, h_lens, labels)
            # data-dependency into the next extract so iterations serialize
            w = w + (0.0 * loss).astype(w.dtype)
        return float(np.asarray(loss))  # host fetch = sync

    chain(1, tparams, opt_state, wavs)  # compile + warm both programs
    lo, hi = max(ITERS // 3, 1), ITERS
    times = {}
    for n in (lo, hi):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            chain(n, tparams, opt_state, wavs)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_step = (times[hi] - times[lo]) / (hi - lo)

    print(json.dumps({
        "metric": "superb_probe_train_throughput",
        "value": round(B * SECS / per_step, 1),
        "unit": "audio-sec/sec/chip",
        "ms_per_step": round(per_step * 1e3, 1),
        "precision": "int8_w8a8_frozen_upstream" if quant else "bf16",
    }))


if __name__ == "__main__":
    main()
