"""Utterance classification task (SID / KS / ER / IC).

Behavioral spec from the reference's UtteranceClassificationTask
(s3prl/task/utterance_classification_task.py:62-227): cross-entropy over a
pooled utterance embedding, accuracy reduction, per-utterance prediction
records. The multi-class variant (IC) sums CE over several label heads.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
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
