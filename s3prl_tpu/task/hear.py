"""HEAR 2021 tasks: scene prediction and timestamp (event) prediction.

Behavioral spec from the reference (s3prl/task/scene_prediction.py,
event_prediction.py + nn/hear.py): a small MLP over pooled (scene) or
per-frame (event) featurized states; scene tasks use CE or multilabel BCE
with accuracy / mAP, event tasks use frame-level BCE with onset-based event
decoding (the reference defers scoring to hear-eval; here mAP and a simple
onset event-F1 are computed natively).
"""

from __future__ import annotations

from typing import List

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


def roc_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Macro ROC-AUC via the rank statistic (hear-eval's aucroc score)."""
    aucs = []
    for c in range(scores.shape[1]):
        y, s = labels[:, c], scores[:, c]
        pos, neg = int(y.sum()), int((1 - y).sum())
        if pos == 0 or neg == 0:
            continue
        order = np.argsort(s)
        ranks = np.empty(len(s))
        ranks[order] = np.arange(1, len(s) + 1)
        aucs.append((ranks[y > 0].sum() - pos * (pos + 1) / 2) / (pos * neg))
    return float(np.mean(aucs)) if aucs else 0.0


def d_prime(auc: float) -> float:
    """hear-eval d_prime: sqrt(2) * norminv(auc)."""
    from scipy.stats import norm

    return float(np.sqrt(2) * norm.ppf(np.clip(auc, 1e-7, 1 - 1e-7)))


class ScenePredictionTask(Task):
    """Clip-level (multi)label prediction with the hear-eval score set
    (reference: s3prl/task/scene_prediction.py + hear-eval ScoreFunction):
    top1_acc, mAP, d_prime, aucroc, and nsynth's pitch/chroma accuracies
    (chroma folds predictions to pitch mod 12 via `class_values`)."""

    def __init__(self, module, num_classes: int, multilabel: bool = False,
                 scores=None, class_values=None):
        self.module = module
        self.num_classes = num_classes
        self.multilabel = multilabel
        self.scores = tuple(scores) if scores else (
            ("mAP", "top1_acc", "d_prime", "aucroc") if multilabel else ("top1_acc",)
        )
        self.class_values = None if class_values is None else np.asarray(class_values)
        self.host_keys = ("unique_name",)

    @property
    def valid_metric(self):
        return self.scores[0]

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
        return loss, {
            "loss": loss, "scores": jax.nn.softmax(logits, -1), "label": labels,
        }

    def reduction(self, mode, records):
        losses = [float(r["loss"]) for r in records]
        out = {"loss": float(np.mean(losses))}
        scores = np.concatenate([np.asarray(r["scores"]) for r in records])
        labels = np.concatenate([np.asarray(r["label"]) for r in records])
        if self.multilabel:
            onehot = labels
            class_ids = None
        else:
            class_ids = labels.astype(int)
            onehot = np.zeros_like(scores)
            onehot[np.arange(len(class_ids)), class_ids] = 1.0
        preds = scores.argmax(-1)
        for name in self.scores:
            if name == "mAP":
                out["mAP"] = mean_average_precision(scores, onehot)
            elif name in ("top1_acc", "accuracy", "pitch_acc"):
                top1 = float((onehot[np.arange(len(preds)), preds] > 0).mean())
                out[name] = top1
            elif name == "aucroc":
                out["aucroc"] = roc_auc(scores, onehot)
            elif name == "d_prime":
                out["d_prime"] = d_prime(roc_auc(scores, onehot))
            elif name == "chroma_acc" and class_ids is not None and self.class_values is not None:
                chroma = self.class_values % 12
                out["chroma_acc"] = float(
                    (chroma[preds] == chroma[class_ids]).mean()
                )
        # keep "accuracy" for backward compatibility with existing recipes
        if not self.multilabel and "accuracy" not in out:
            out["accuracy"] = float((preds == class_ids).mean())
        return out


class EventPredictionTask(Task):
    """Frame-level multilabel activity -> onset-decoded events.

    `onset_tolerance_ms` mirrors hear-eval's event_onset_*ms_fms scores
    (dcase: 200 ms, maestro: 50 ms)."""

    def __init__(self, module, num_classes: int, threshold: float = 0.5,
                 onset_tolerance_ms: float = 50.0, frame_shift_ms: float = 10.0,
                 score_name: str = "event_f1"):
        self.module = module
        self.num_classes = num_classes
        self.threshold = threshold
        self.tolerance_frames = max(int(round(onset_tolerance_ms / frame_shift_ms)), 1)
        self.score_name = score_name
        self.host_keys = ("unique_name",)

    @property
    def valid_metric(self):
        return self.score_name

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
                            if j not in used and abs(p - q) <= self.tolerance_frames:
                                matched += 1
                                used.add(j)
                                break
                    tp += matched
                    fp += len(pred_events) - matched
                    fn += len(ref_events) - matched
        precision = tp / max(tp + fp, 1)
        recall = tp / max(tp + fn, 1)
        f1 = 2 * precision * recall / max(precision + recall, 1e-9)
        return {"loss": float(np.mean(losses)), self.score_name: f1}


def _onsets(activity: np.ndarray) -> List[int]:
    starts = np.flatnonzero(np.diff(np.concatenate([[0], activity])) == 1)
    return starts.tolist()
