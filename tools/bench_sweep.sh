#!/bin/bash
# On-chip serving-config sweep: one bench.py run per env configuration,
# serialized (single-host-CPU box; XLA compiles contend). Each line of
# sweep output is the config followed by bench.py's JSON line.
#
# Usage: tools/bench_sweep.sh [out_file]
# Edit CONFIGS below per sweep; keep runs short via BENCH_BF16=0.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/bench_sweep.jsonl}"
: > "$OUT"

CONFIGS=(
  ""                                # serving default (control)
  "S3PRL_GELU=relu"                 # VPU-cost probe (NOT gelu)
  "S3PRL_GELU=sigmoid"              # 1-exp gelu approx
  "S3PRL_BQF=256"
  "S3PRL_BQF=1024"
  "S3PRL_FCHUNK=4096"
  "S3PRL_POSCONV=pallas"
  "S3PRL_POSCONV=pallas_q8"
)

for cfg in "${CONFIGS[@]}"; do
  echo "=== $cfg" | tee -a "$OUT"
  env $cfg BENCH_BF16=0 timeout 420 python bench.py 2>/dev/null | tail -1 | tee -a "$OUT"
done
