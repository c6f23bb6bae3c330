#!/bin/bash
# Restart-loop fault tolerance (analog of the reference's s3prl/run_while.sh):
# rerun the given command up to 100 times; combined with auto-resume
# (checkpoint step dirs) this yields crash-resilient long trainings.
#   ./run_while.sh python -m s3prl_tpu.main SuperbASR --target_dir exp/asr ...
for i in $(seq 1 100); do
    "$@" && break
    echo "[run_while] trial $i exited nonzero; restarting..."
    sleep 5
done
