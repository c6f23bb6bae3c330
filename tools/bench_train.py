"""SUPERB-probe TRAINING throughput benchmark (the reference's workload).

The reference's headline use is 200k-step frozen-upstream probe training
(SURVEY §6, downstream/asr/config.yaml) — run_downstream.py spends ~95% of
its step in the frozen upstream forward (SURVEY §3.1 hot loop). This bench
measures full train-step throughput of the equivalent path here:

  frozen HuBERT-Large (int8 serving forward by default, BENCH_QUANT=0 for
  bf16) -> stop_gradient -> Featurizer weighted sum -> UtteranceLevel probe
  -> CE loss -> Adam update of the featurizer+head params,

one jitted step, stepped in an on-device fori_loop (host timing lies on the
axon tunnel — same protocol as bench.py). Because the upstream is frozen,
the forward-only serving kernels are legal inside the training step; XLA
dead-code-eliminates the upstream backward entirely.

Prints one JSON line {"metric", "value", "unit"}.

Status note (round 2): the program compiles and runs on CPU (validated
end-to-end at a small protocol) but the axon tunnel's remote-compile
service repeatedly dropped the connection ("Broken pipe") after ~40-55 min
compiling this program on the real chip — an infra limitation, not a code
path issue (bench.py's near-identical extraction program compiles there).
Expected on-chip result ≈ the extraction throughput: the frozen upstream
forward is ~99% of the step's FLOPs and XLA DCEs its backward.
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
ITERS = int(os.environ.get("BENCH_ITERS", 10))
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
    # init without compiling the upstream forward a second time: eval_shape
    # gives the hidden-state shapes for free, and the (small) head init is
    # one fast jit — only the train loop below compiles the big program
    hs_s, hl_s = jax.eval_shape(
        lambda w, l: up.apply_standardized(up.params, w, l), wavs, lens)
    tparams = jax.jit(
        lambda k: model.init(k, jnp.zeros(hs_s.shape, hs_s.dtype),
                             jnp.zeros(hl_s.shape, hl_s.dtype))["params"]
    )(jax.random.key(0))
    opt = optax.adam(1e-4)
    opt_state = opt.init(tparams)

    def loss_fn(tparams, hs, h_lens, labels):
        logits = model.apply({"params": tparams}, hs, h_lens)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        ).mean()

    @jax.jit
    def train_step(tparams, opt_state, wavs, lens, labels):
        hs, h_lens = up.apply_standardized(up.params, wavs, lens)
        hs = jax.lax.stop_gradient(hs)  # frozen upstream (SUPERB protocol)
        loss, grads = jax.value_and_grad(loss_fn)(tparams, hs, h_lens, labels)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(tparams, updates), opt_state, loss

    # Round-3 protocol: compile ONE step (the round-2 fori_loop wrapper blew
    # past the tunnel compile-service limit, header note) and chain N async
    # dispatches through the device-resident (tparams, opt_state) — a true
    # data dependency — fetching only the last loss. Marginal time between
    # two chain lengths cancels the tunnel round-trip + dispatch overheads.
    def chain(n, tp, st):
        loss = None
        for _ in range(n):
            tp, st, loss = train_step(tp, st, wavs, lens, labels)
        return float(np.asarray(loss))  # host fetch = sync

    chain(1, tparams, opt_state)  # compile + warm
    lo, hi = max(ITERS // 3, 1), ITERS
    times = {}
    for n in (lo, hi):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            chain(n, tparams, opt_state)
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
