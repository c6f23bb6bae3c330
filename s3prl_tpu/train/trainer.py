"""The training engine.

One step-based train loop serving both reference generations (legacy
downstream Runner, s3prl/downstream/runner.py:286-419, and the new Problem
train loop, s3prl/problem/base.py:287-553): gradient accumulation, global
norm clipping, non-finite-grad skip, periodic leader-only logging/eval,
directory checkpoints with auto-resume and valid-best tracking.

TPU-first:
- upstream + downstream + loss compile into ONE jit program per bucket shape
  (the frozen upstream runs under stop_gradient inside the same XLA program
  — no separate inference pass or host round-trip);
- the mesh is a constructor argument: batch arrays are placed with a "dp"
  sharding and parameters replicated (or TP-sharded via parallel.mesh rules);
  gradient reduction is XLA's psum — there is no DDP wrapper to port;
- stochastic ops (dropout/specaug) draw from a step-indexed PRNG fold —
  resume-stable regardless of history.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import jax
import numpy as np
import optax

from . import checkpoint as ckpt
from .optimizers import build_optimizer
from ..parallel.mesh import batch_sharding
from ..upstream.base import Upstream

logger = logging.getLogger(__name__)


@dataclass
class TrainerConfig:
    total_steps: int = 1000
    log_step: int = 100
    eval_step: int = 500
    save_step: int = 500
    gradient_clipping: float = 1.0
    gradient_accumulate: int = 1
    keep_num_ckpts: int = 2
    seed: int = 1337
    optimizer: dict = field(default_factory=lambda: {"name": "Adam", "lr": 1.0e-4})
    upstream_trainable: bool = False
    tensorboard: bool = True  # leader-only event files under exp_dir/tb
    #: multi-device training, reachable from every recipe's `train:` config
    #: block (the TPU-native analog of the reference's CLI-launched DDP,
    #: run_downstream.py:166-168 / problem/base.py:426-433): `dp` data-parallel
    #: ways (None = all remaining devices), `tp` Megatron-style tensor-parallel
    #: ways. dp*tp must equal the visible device count; dp=1/tp=1 (default)
    #: is the unsharded single-device path.
    dp: Optional[int] = None
    tp: int = 1
    #: resume from the newest step dir when one exists. Default True matches
    #: the reference's new API (problem/base.py:374-421); the legacy shim
    #: overrides with its opt-in -a flag (run_downstream.py:93-107).
    auto_resume: bool = True


def _split_batch(batch: dict):
    """Numeric arrays go to device; everything else stays host-side."""
    device, host = {}, {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype.kind in "fiub":
            device[k] = v
        else:
            host[k] = v
    return device, host


class Trainer:
    def __init__(
        self,
        upstream: Upstream,
        task,
        exp_dir,
        config: TrainerConfig,
        mesh=None,
        tb_writer=None,
    ):
        self.upstream = upstream
        self.task = task
        self.exp_dir = Path(exp_dir)
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        self.cfg = config
        if mesh is None and (config.dp is not None or config.tp != 1):
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(dp=config.dp, tp=config.tp)
            logger.info(
                f"trainer mesh from config: dp={mesh.shape['dp']} tp={mesh.shape['tp']}"
            )
        self.mesh = mesh
        self.optimizer = build_optimizer(
            gradient_clipping=config.gradient_clipping,
            gradient_accumulate=config.gradient_accumulate,
            total_steps=config.total_steps,
            **config.optimizer,
        )
        self._root_key = jax.random.key(config.seed)
        self.step = 0
        self.params = None
        self.opt_state = None
        self._best_metric = None
        if tb_writer is None and config.tensorboard and jax.process_index() == 0:
            # TensorBoard event output alongside JSONL, leader-only
            # (reference: s3prl/problem/base.py:466-468 SummaryWriter usage)
            try:
                from torch.utils.tensorboard import SummaryWriter

                tb_writer = SummaryWriter(log_dir=str(self.exp_dir / "tb"))
            except Exception as e:  # TB optional: JSONL remains authoritative
                logger.info(f"tensorboard writer unavailable ({e}); JSONL only")
        self._tb = tb_writer
        self._metrics_file = self.exp_dir / "metrics.jsonl"

        self._train_step = self._build_step(train=True)
        self._eval_step = self._build_step(train=False)

    # ------------------------------------------------------------------
    def _build_step(self, train: bool):
        task = self.task
        upstream = self.upstream
        optimizer = self.optimizer
        trainable_upstream = self.cfg.upstream_trainable

        def loss_fn(params, up_params, batch, rng):
            k_up, k_task = jax.random.split(rng)
            hs, h_lens = upstream.apply_standardized(
                up_params, batch["x"], batch["x_len"],
                train=train and trainable_upstream,
                rngs={"dropout": k_up} if (train and trainable_upstream) else None,
            )
            if not trainable_upstream:
                hs = jax.lax.stop_gradient(hs)
            return task.loss_and_cache(params, hs, h_lens, batch, k_task, train)

        if train:

            @jax.jit
            def step_fn(params, opt_state, up_params, batch, rng):
                (loss, cache), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, up_params, batch, rng
                )
                updates, new_opt_state = optimizer.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                if hasattr(task, "post_update"):
                    # task-owned non-gradient state transitions (e.g. the
                    # data2vec EMA teacher) run inside the same XLA program
                    new_params = task.post_update(new_params)
                return new_params, new_opt_state, loss, cache, optax.global_norm(grads)

            return step_fn

        @jax.jit
        def eval_fn(params, up_params, batch, rng):
            return loss_fn(params, up_params, batch, rng)

        return eval_fn

    # ------------------------------------------------------------------
    def init(self, example_batch: dict, resume: bool = True) -> None:
        """Initialize (or auto-resume) parameters + optimizer state."""
        device, _ = _split_batch(example_batch)
        hs, h_lens = self.upstream.apply_standardized(
            self.upstream.params, device["x"], device["x_len"]
        )
        key = jax.random.fold_in(self._root_key, 0)
        self.params = self.task.init_params(key, hs, h_lens, device)
        self.opt_state = self.optimizer.init(self.params)

        if resume:
            latest = ckpt.latest_checkpoint(self.exp_dir)
            if latest is not None:
                self.params, self.opt_state, stats = ckpt.load_checkpoint(
                    latest, self.params, self.opt_state
                )
                self.step = int(stats.get("step", 0))
                self._best_metric = stats.get("best_metric")
                logger.info(f"resumed from {latest} at step {self.step}")

        if self.mesh is not None:
            from ..parallel.mesh import shard_params

            # TP rules shard the trunk/head matmuls over "tp" (replicate-only
            # when tp=1); optimizer moments mirror the param tree so the same
            # trailing-path rules shard them identically. Upstream params are
            # placed too so every array the jitted step touches lives on the
            # mesh.
            self.params = shard_params(self.mesh, self.params)
            self.opt_state = shard_params(self.mesh, self.opt_state)
            self.upstream.params = shard_params(self.mesh, self.upstream.params)

    def _place_batch(self, device_batch: dict, replicate: bool = False) -> dict:
        if self.mesh is not None:
            if replicate:
                # evaluation is single-program semantics in the reference
                # (runner.py:433 "single-process-only"); replicating the eval
                # batch keeps metrics bit-identical to the unsharded path and
                # tolerates batch sizes not divisible by dp
                from jax.sharding import NamedSharding, PartitionSpec as P

                return jax.device_put(device_batch, NamedSharding(self.mesh, P()))
            sharding = batch_sharding(self.mesh)
            b = next(iter(device_batch.values())).shape[0] if device_batch else 0
            if b % self.mesh.shape["dp"] != 0:
                raise ValueError(
                    f"train batch size {b} not divisible by dp={self.mesh.shape['dp']}; "
                    "pick batch_size as a multiple of dp (bucketed static shapes)"
                )
            if jax.process_count() > 1:
                # multi-host: each process holds its DistributedBatchSampler
                # shard of the global batch; assemble the global array
                return {
                    k: jax.make_array_from_process_local_data(sharding, v)
                    for k, v in device_batch.items()
                }
            return jax.device_put(device_batch, sharding)
        return device_batch

    def _log(self, mode: str, logs: Dict[str, float]) -> None:
        import json

        payload = {"mode": mode, "step": self.step, **logs}
        with open(self._metrics_file, "a") as f:
            f.write(json.dumps(payload) + "\n")
        if self._tb is not None:
            for k, v in logs.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(f"{mode}/{k}", v, self.step)
        logger.info(f"[{mode}] step {self.step}: " + ", ".join(f"{k}={v:.5g}" for k, v in logs.items() if isinstance(v, (int, float))))

    # ------------------------------------------------------------------
    def train(self, train_loader, valid_loader=None) -> None:
        cfg = self.cfg
        records: List[dict] = []
        epoch = 0
        t0 = time.time()
        while self.step < cfg.total_steps:
            train_loader.set_epoch(epoch)
            for batch in train_loader:
                if self.step >= cfg.total_steps:
                    break
                device, host = _split_batch(batch)
                if self.params is None:
                    self.init(batch, resume=self.cfg.auto_resume)
                device = self._place_batch(device)
                rng = jax.random.fold_in(self._root_key, self.step + 1)
                self.params, self.opt_state, loss, cache, grad_norm = self._train_step(
                    self.params, self.opt_state, self.upstream.params, device, rng
                )
                self.step += 1
                record = {k: np.asarray(v) for k, v in cache.items()}
                record.update({k: host[k] for k in self.task.host_keys if k in host})
                records.append(record)

                if self.step % cfg.log_step == 0:
                    logs = self.task.reduction("train", records)
                    logs["grad_norm"] = float(grad_norm)
                    logs["steps_per_sec"] = cfg.log_step / max(time.time() - t0, 1e-9)
                    t0 = time.time()
                    self._log("train", logs)
                    records = []

                if valid_loader is not None and self.step % cfg.eval_step == 0:
                    valid_logs = self.evaluate(valid_loader, "valid")
                    self._maybe_mark_best(valid_logs)

                if self.step % cfg.save_step == 0:
                    self.save()
            epoch += 1
        self.save()

    def evaluate(self, loader, mode: str = "valid") -> Dict[str, float]:
        records = []
        for batch in loader:
            device, host = _split_batch(batch)
            if self.params is None:
                self.init(batch)
            device = self._place_batch(device, replicate=True)
            rng = jax.random.fold_in(self._root_key, 0)
            loss, cache = self._eval_step(self.params, self.upstream.params, device, rng)
            record = {k: np.asarray(v) for k, v in cache.items()}
            record.update({k: host[k] for k in self.task.host_keys if k in host})
            records.append(record)
        logs = self.task.reduction(mode, records)
        self._log(mode, logs)
        return logs

    def _maybe_mark_best(self, logs: Dict[str, float]) -> None:
        metric = logs.get(self.task.valid_metric)
        if metric is None:
            return
        better = (
            self._best_metric is None
            or (metric > self._best_metric) == self.task.valid_higher_better
        )
        if better and metric != self._best_metric:
            self._best_metric = float(metric)
            self.save()
            ckpt.mark_valid_best(self.exp_dir, self.step)
            logger.info(f"new valid best {self.task.valid_metric}={metric:.5g}")

    def save(self) -> None:
        ckpt.save_checkpoint(
            self.exp_dir,
            self.step,
            jax.device_get(self.params),
            jax.device_get(self.opt_state),
            stats={"best_metric": self._best_metric},
            keep_num_ckpts=self.cfg.keep_num_ckpts,
        )
