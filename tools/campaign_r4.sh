#!/bin/bash
# Round-4 on-chip measurement campaign, fully serialized (1-CPU box: XLA
# compiles contend with everything). Appends results to the log as it goes.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/campaign_r4.log}"
run() {
  echo "===== $*" >> "$LOG"
  timeout 480 env "$@" >> "$LOG" 2>&1
  echo "--- rc=$?" >> "$LOG"
}

echo "== campaign start $(date -u)" >> "$LOG"
# 1. effective HBM bandwidth (decides whether traffic-cutting fusions can win)
run python tools/bench_hbm.py
# 2. conv front-end per-stage decomposition (serving default: tanh)
run python tools/bench_conv_stages.py
# 3. posconv A/B: XLA grouped conv vs fixed Pallas bf16/int8 kernels
run python tools/bench_posconv.py
# 4. encoder attribution: ffn vs attention block + GELU-variant probes
run VARIANT=ffn_only python tools/bench_layer.py
run VARIANT=ffn_only S3PRL_GELU=relu python tools/bench_layer.py
run VARIANT=ffn_only S3PRL_GELU=sigmoid python tools/bench_layer.py
run VARIANT=ffn_only S3PRL_BQF=1024 python tools/bench_layer.py
run VARIANT=ffn_only S3PRL_BQF=256 python tools/bench_layer.py
run VARIANT=ffn_only S3PRL_FCHUNK=4096 python tools/bench_layer.py
run VARIANT=attn_block python tools/bench_layer.py
run VARIANT=serving_block python tools/bench_layer.py
echo "== campaign done $(date -u)" >> "$LOG"
