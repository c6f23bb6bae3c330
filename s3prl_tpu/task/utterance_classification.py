"""Utterance classification task (SID / KS / ER / IC).

Behavioral spec from the reference's UtteranceClassificationTask
(s3prl/task/utterance_classification_task.py:62-227): cross-entropy over a
pooled utterance embedding, accuracy reduction, per-utterance prediction
records. The multi-class variant (IC) sums CE over several label heads.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np
import optax

from .base import Task
from ..metric import accuracy


class UtteranceClassificationTask(Task):
    def __init__(self, module, num_classes: int):
        self.module = module
        self.num_classes = num_classes
        self.host_keys = ("unique_name",)

    valid_metric = "accuracy"
    valid_higher_better = True

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        logits = self.module.apply(
            {"params": params}, hs, h_lens, train=train,
            rngs={"dropout": rng} if train else None,
        )
        labels = batch["class_id"]
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        pred = jnp.argmax(logits, axis=-1)
        return loss, {"loss": loss, "prediction": pred, "label": labels}

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        preds = np.concatenate([r["prediction"] for r in records])
        labels = np.concatenate([r["label"] for r in records])
        losses = [float(r["loss"]) for r in records]
        return {"accuracy": accuracy(preds.tolist(), labels.tolist()), "loss": float(np.mean(losses))}


class UtteranceMultiClassClassificationTask(Task):
    """Several independent category heads (SUPERB IC: action/object/location).

    Reference: task/utterance_classification_task.py (MultiClass variant) —
    the module emits one concatenated logit vector; it is split per head and
    CE summed; an utterance counts as correct when every head is correct.
    """

    def __init__(self, module, class_sizes: Tuple[int, ...]):
        self.module = module
        self.class_sizes = tuple(class_sizes)
        self.host_keys = ("unique_name",)

    valid_metric = "accuracy"
    valid_higher_better = True

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        logits = self.module.apply(
            {"params": params}, hs, h_lens, train=train,
            rngs={"dropout": rng} if train else None,
        )
        labels = batch["class_ids"]  # [B, num_heads]
        start = 0
        loss = 0.0
        preds = []
        for i, size in enumerate(self.class_sizes):
            head = logits[:, start : start + size]
            loss = loss + optax.softmax_cross_entropy_with_integer_labels(
                head, labels[:, i]
            ).mean()
            preds.append(jnp.argmax(head, axis=-1))
            start += size
        pred = jnp.stack(preds, axis=-1)  # [B, num_heads]
        return loss, {"loss": loss, "prediction": pred, "label": labels}

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        preds = np.concatenate([r["prediction"] for r in records])
        labels = np.concatenate([r["label"] for r in records])
        correct = (preds == labels).all(axis=-1)
        losses = [float(r["loss"]) for r in records]
        return {"accuracy": float(correct.mean()), "loss": float(np.mean(losses))}


class FrameClassificationTask(Task):
    """Frame-level classification probe (reference: downstream/phone_linear/
    expert.py:123-165 and the speaker/voxceleb1_framelevel variants):
    per-frame CE over aligned frame labels; features and labels are matched
    by truncation to the shorter sequence (reference _match_length), frames
    with label < 0 (padding) are masked; accuracy is frame-weighted.

    Batches carry either 'frame_labels' [B, T_lab] (padded with -100) or a
    per-utterance 'class_id' broadcast over the valid frames."""

    def __init__(self, module, num_classes: int):
        self.module = module
        self.num_classes = num_classes
        self.host_keys = ("unique_name",)

    valid_metric = "accuracy"
    valid_higher_better = True

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        out = self.module.apply(
            {"params": params}, hs, h_lens, train=train,
            rngs={"dropout": rng} if train else None,
        )
        logits, out_lens = out if isinstance(out, tuple) else (out, h_lens)
        B, T = logits.shape[:2]
        frame_valid = jnp.arange(T)[None, :] < out_lens[:, None]
        if "frame_labels" in batch:
            labels = batch["frame_labels"]
            Tm = min(T, labels.shape[1])
            logits = logits[:, :Tm]
            labels = labels[:, :Tm]
            valid = frame_valid[:, :Tm] & (labels >= 0)
        else:
            labels = jnp.broadcast_to(batch["class_id"][:, None], (B, T))
            valid = frame_valid
            Tm = T
        safe_labels = jnp.maximum(labels, 0)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), safe_labels)
        denom = jnp.maximum(valid.sum(), 1)
        loss = jnp.where(valid, ce, 0.0).sum() / denom
        pred = jnp.argmax(logits, axis=-1)
        correct = jnp.where(valid, (pred == safe_labels), False)
        return loss, {
            "loss": loss,
            "n_correct": correct.sum(),
            "n_frames": valid.sum(),
        }

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        n_correct = float(np.sum([float(r["n_correct"]) for r in records]))
        n_frames = float(np.sum([float(r["n_frames"]) for r in records]))
        losses = [float(r["loss"]) for r in records]
        return {"accuracy": n_correct / max(n_frames, 1.0),
                "loss": float(np.mean(losses))}
