"""HEAR 2021 tasks: scene prediction and timestamp (event) prediction.

Behavioral spec from the reference (s3prl/task/scene_prediction.py,
event_prediction.py + nn/hear.py): a small MLP over pooled (scene) or
per-frame (event) featurized states; scene tasks use CE or multilabel BCE
with accuracy / mAP, event tasks use frame-level BCE with onset-based event
decoding (the reference defers scoring to hear-eval; here mAP and a simple
onset event-F1 are computed natively).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .base import Task
from ..ops.masking import length_mask


def mean_average_precision(scores: np.ndarray, labels: np.ndarray) -> float:
    """scores/labels [N, C]; macro mAP over classes with any positives."""
    aps = []
    for c in range(scores.shape[1]):
        y, s = labels[:, c], scores[:, c]
        if y.sum() == 0:
            continue
        order = np.argsort(-s)
        y = y[order]
        cum = np.cumsum(y)
        precision = cum / (np.arange(len(y)) + 1)
        aps.append((precision * y).sum() / max(y.sum(), 1))
    return float(np.mean(aps)) if aps else 0.0


class ScenePredictionTask(Task):
    def __init__(self, module, num_classes: int, multilabel: bool = False):
        self.module = module
        self.num_classes = num_classes
        self.multilabel = multilabel
        self.host_keys = ("unique_name",)

    @property
    def valid_metric(self):
        return "mAP" if self.multilabel else "accuracy"

    valid_higher_better = True

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        logits = self.module.apply(
            {"params": params}, hs, h_lens, train=train,
            rngs={"dropout": rng} if train else None,
        )
        if self.multilabel:
            targets = batch["multilabel"].astype(jnp.float32)
            loss = optax.sigmoid_binary_cross_entropy(logits, targets).mean()
            scores = jax.nn.sigmoid(logits)
            return loss, {"loss": loss, "scores": scores, "label": targets}
        labels = batch["class_id"]
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        return loss, {"loss": loss, "prediction": jnp.argmax(logits, -1), "label": labels}

    def reduction(self, mode, records):
        losses = [float(r["loss"]) for r in records]
        out = {"loss": float(np.mean(losses))}
        if self.multilabel:
            scores = np.concatenate([r["scores"] for r in records])
            labels = np.concatenate([r["label"] for r in records])
            out["mAP"] = mean_average_precision(scores, labels)
        else:
            preds = np.concatenate([r["prediction"] for r in records])
            labels = np.concatenate([r["label"] for r in records])
            out["accuracy"] = float((preds == labels).mean())
        return out


class EventPredictionTask(Task):
    """Frame-level multilabel activity -> onset-decoded events."""

    def __init__(self, module, num_classes: int, threshold: float = 0.5):
        self.module = module
        self.num_classes = num_classes
        self.threshold = threshold
        self.host_keys = ("unique_name",)

    valid_metric = "event_f1"
    valid_higher_better = True

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        logits, out_lens = self.module.apply(
            {"params": params}, hs, h_lens, train=train,
            rngs={"dropout": rng} if train else None,
        )
        T = min(logits.shape[1], batch["frame_labels"].shape[1])
        targets = batch["frame_labels"][:, :T].astype(jnp.float32)
        logits = logits[:, :T]
        valid = length_mask(jnp.minimum(out_lens, T), T, jnp.float32)[..., None]
        bce = optax.sigmoid_binary_cross_entropy(logits, targets)
        loss = (bce * valid).sum() / jnp.maximum(valid.sum() * self.num_classes, 1.0)
        return loss, {
            "loss": loss,
            "scores": jax.nn.sigmoid(logits),
            "label": targets,
            "lens": jnp.minimum(out_lens, T),
        }

    def reduction(self, mode, records):
        tp = fp = fn = 0
        losses = []
        for r in records:
            losses.append(float(r["loss"]))
            scores, labels, lens = np.asarray(r["scores"]), np.asarray(r["label"]), np.asarray(r["lens"])
            for b in range(len(scores)):
                n = int(lens[b])
                pred_on = (scores[b, :n] > self.threshold).astype(int)
                ref_on = labels[b, :n].astype(int)
                for c in range(pred_on.shape[-1]):
                    pred_events = _onsets(pred_on[:, c])
                    ref_events = _onsets(ref_on[:, c])
                    matched = 0
                    used = set()
                    for p in pred_events:
                        for j, q in enumerate(ref_events):
                            if j not in used and abs(p - q) <= 5:  # 5-frame tolerance
                                matched += 1
                                used.add(j)
                                break
                    tp += matched
                    fp += len(pred_events) - matched
                    fn += len(ref_events) - matched
        precision = tp / max(tp + fp, 1)
        recall = tp / max(tp + fn, 1)
        f1 = 2 * precision * recall / max(precision + recall, 1e-9)
        return {"loss": float(np.mean(losses)), "event_f1": f1}


def _onsets(activity: np.ndarray) -> List[int]:
    starts = np.flatnonzero(np.diff(np.concatenate([[0], activity])) == 1)
    return starts.tolist()
