"""Directory checkpoints + auto-resume.

Behavioral spec from the reference's new-API checkpoint scheme
(s3prl/problem/base.py:374-421, 470-503, 601-628): per-step directories
`step_<N>/` holding params / optimizer state / training stats + config,
`valid_best/` tracked by a configurable metric/direction, `keep_num_ckpts`
GC, and resume = newest step dir. Weights are flax msgpack; stats/config are
yaml — rebuild-from-config + load-weights semantics preserved.
"""

from __future__ import annotations

import logging
import shutil
from pathlib import Path
from typing import Any, Optional, Tuple

import yaml
from flax import serialization

logger = logging.getLogger(__name__)


def save_checkpoint(
    exp_dir,
    step: int,
    params: Any,
    opt_state: Any = None,
    stats: Optional[dict] = None,
    config: Optional[dict] = None,
    keep_num_ckpts: Optional[int] = 2,
) -> Path:
    step_dir = Path(exp_dir) / f"step_{step}"
    step_dir.mkdir(parents=True, exist_ok=True)
    (step_dir / "params.msgpack").write_bytes(serialization.to_bytes(params))
    if opt_state is not None:
        (step_dir / "opt_state.msgpack").write_bytes(serialization.to_bytes(opt_state))
    with open(step_dir / "training_stats.yaml", "w") as f:
        yaml.safe_dump(dict(step=step, **(stats or {})), f)
    if config is not None:
        with open(step_dir / "config.yaml", "w") as f:
            yaml.safe_dump(config, f)
    if keep_num_ckpts:
        _gc_old_ckpts(exp_dir, keep_num_ckpts)
    return step_dir


def _step_dirs(exp_dir) -> list:
    dirs = [d for d in Path(exp_dir).glob("step_*") if d.is_dir()]
    return sorted(dirs, key=lambda d: int(d.name.split("_")[1]))


def _gc_old_ckpts(exp_dir, keep: int) -> None:
    dirs = _step_dirs(exp_dir)
    for d in dirs[:-keep]:
        shutil.rmtree(d, ignore_errors=True)


def latest_checkpoint(exp_dir) -> Optional[Path]:
    dirs = _step_dirs(exp_dir)
    return dirs[-1] if dirs else None


def load_checkpoint(
    step_dir, params_template: Any, opt_state_template: Any = None
) -> Tuple[Any, Any, dict]:
    step_dir = Path(step_dir)
    params = serialization.from_bytes(
        params_template, (step_dir / "params.msgpack").read_bytes()
    )
    opt_state = None
    if opt_state_template is not None and (step_dir / "opt_state.msgpack").exists():
        opt_state = serialization.from_bytes(
            opt_state_template, (step_dir / "opt_state.msgpack").read_bytes()
        )
    with open(step_dir / "training_stats.yaml") as f:
        stats = yaml.safe_load(f) or {}
    return params, opt_state, stats


def mark_valid_best(exp_dir, step: int) -> None:
    """Copy step_<N> to valid_best/ (reference: problem/base.py:601-612)."""
    src = Path(exp_dir) / f"step_{step}"
    dst = Path(exp_dir) / "valid_best"
    if dst.exists():
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
