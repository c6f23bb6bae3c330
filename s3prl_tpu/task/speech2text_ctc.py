"""CTC speech-to-text task (SUPERB ASR / PR / SF).

Behavioral spec from the reference's Speech2TextCTCTask
(s3prl/task/speech2text_ctc_task.py:107-137): CTC loss with blank == pad id
and infinite-loss clamping, greedy decode = per-frame argmax ->
unique-consecutive -> drop blanks, WER/CER reduction. Loss is
optax.ctc_loss — same forward-backward recursion XLA-compiled for TPU.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np
import optax

from .base import Task
from ..metric import cer, per, wer
from ..ops.masking import length_mask


class Speech2TextCTCTask(Task):
    def __init__(self, module, tokenizer, metric: str = "wer"):
        self.module = module
        self.tokenizer = tokenizer
        self.metric = metric  # "wer" (ASR) | "per" (PR) | slot metrics via SF
        self.host_keys = ("labels", "unique_name")

    @property
    def valid_metric(self):
        return self.metric

    valid_higher_better = False

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        logits, out_lens = self.module.apply(
            {"params": params}, hs, h_lens, train=train,
            rngs={"dropout": rng} if train else None,
        )
        B, T, V = logits.shape
        tokens = batch["class_ids"]  # [B, N] padded with pad_idx (=blank=0)
        token_lens = batch["class_ids_len"]
        logit_paddings = 1.0 - length_mask(out_lens, T, jnp.float32)
        label_paddings = 1.0 - length_mask(token_lens, tokens.shape[1], jnp.float32)
        per_seq = optax.ctc_loss(
            logits, logit_paddings, tokens, label_paddings, blank_id=self.tokenizer.pad_idx
        )
        # zero_infinity semantics (reference: speech2text_ctc_task.py:107-110)
        per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)
        loss = per_seq.sum() / jnp.maximum((token_lens > 0).sum(), 1)
        pred = jnp.argmax(logits, axis=-1)  # [B, T]
        return loss, {"loss": loss, "prediction": pred, "prediction_len": out_lens}

    def _decode(self, ids: np.ndarray, length: int) -> str:
        return self.tokenizer.decode(ids[:length].tolist(), ignore_repeat=True)

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        hyps, refs, losses = [], [], []
        for r in records:
            preds = r["prediction"]
            lens = r["prediction_len"]
            for b in range(len(preds)):
                hyps.append(self._decode(np.asarray(preds[b]), int(lens[b])))
            refs.extend(r["labels"])
            losses.append(float(r["loss"]))
        out = {
            "loss": float(np.mean(losses)),
            "wer": wer(hyps, refs),
            "cer": cer(hyps, refs),
        }
        if self.metric == "per":
            out["per"] = per(hyps, refs)
        return out


class SlotFillingCTCTask(Speech2TextCTCTask):
    """SF variant: adds slot-type F1 / slot-value CER+WER to the reduction
    (reference: task/speech2text_ctc_task.py used with the slot tokenizer +
    metric/slot_filling.py)."""

    def __init__(self, module, tokenizer):
        super().__init__(module, tokenizer, metric="slot_type_f1")

    valid_higher_better = True

    def reduction(self, mode, records):
        from ..metric.slot_filling import slot_type_f1, slot_value_cer, slot_value_wer

        hyps, refs, losses = [], [], []
        for r in records:
            preds, lens = r["prediction"], r["prediction_len"]
            for b in range(len(preds)):
                hyps.append(self._decode(np.asarray(preds[b]), int(lens[b])))
            refs.extend(r["labels"])
            losses.append(float(r["loss"]))
        return {
            "loss": float(np.mean(losses)),
            "slot_type_f1": slot_type_f1(hyps, refs),
            "slot_value_cer": slot_value_cer(hyps, refs),
            "slot_value_wer": slot_value_wer(hyps, refs),
        }
