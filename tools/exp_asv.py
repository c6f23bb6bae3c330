"""ASV convergence experiment driver: override AsvConvergence config via env.

Usage: ASV_STEPS=800 ASV_HIDDEN=256 ASV_LR=1e-3 python tools/exp_asv.py
Prints the train-acc trajectory + test EER for fast hypothesis testing.
Not part of the committed convergence protocol (tools/convergence_suite.py).
"""

import json
import os
import sys
import tempfile
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from convergence_suite import AsvConvergence


def main():
    suite = AsvConvergence()
    cfg = suite.default_config()
    h = int(os.environ.get("ASV_HIDDEN", 64))
    cfg["prepare_data"] = {
        "num_speakers": int(os.environ.get("ASV_SPK", 24)),
        "utts_per_speaker": int(os.environ.get("ASV_UTTS", 20)),
    }
    cfg["build_downstream"] = {
        "output_size": int(os.environ.get("ASV_OUT", 64)),
        "hidden_size": h,
        "aggregation_size": int(os.environ.get("ASV_AGG", 2 * h)),
        "dropout_p": float(os.environ.get("ASV_DROPOUT", 0.0)),
    }
    cfg["build_task"] = {"margin": float(os.environ.get("ASV_MARGIN", 0.1)),
                         "scale": float(os.environ.get("ASV_SCALE", 30.0))}
    cfg["build_batch_sampler"] = {"batch_size": int(os.environ.get("ASV_BATCH", 8))}
    cfg["build_optimizer"] = {"name": "AdamW",
                              "lr": float(os.environ.get("ASV_LR", 1e-3))}
    cfg.pop("target_dir")
    with tempfile.TemporaryDirectory() as ws:
        results = suite.run(ws, **cfg)
        metrics = [json.loads(l) for l in
                   (Path(ws) / "train" / "metrics.jsonl").read_text().splitlines()]
    accs = [m["accuracy"] for m in metrics if m["mode"] == "train"]
    losses = [m["loss"] for m in metrics if m["mode"] == "train"]
    tag = os.environ.get("ASV_TAG", "exp")
    print(f"[{tag}] acc: {[round(a, 2) for a in accs[:: max(len(accs) // 10, 1)]]}")
    print(f"[{tag}] loss: {[round(l, 2) for l in losses[:: max(len(losses) // 10, 1)]]}")
    test = results["evaluate_stage"]["test"]
    print(f"[{tag}] final acc: {accs[-1]:.3f} test: "
          + json.dumps({k: round(float(v), 4) for k, v in test.items()
                        if isinstance(v, (int, float))}))


if __name__ == "__main__":
    main()
