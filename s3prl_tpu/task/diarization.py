"""Speaker diarization task (SUPERB SD).

Behavioral spec from the reference's DiarizationPIT task
(s3prl/task/diarization.py:25-160): frame-level multi-speaker activity
prediction trained with permutation-invariant BCE (all speaker permutations,
take the min), DER-component accumulation in reduction.

TPU note: for the SUPERB setting (2 speakers) the permutation set is tiny
and evaluated as a stacked vectorized batch — no host loops.
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .base import Task
from ..metric.diarization import calc_diarization_error
from ..ops.masking import length_mask


class DiarizationPITTask(Task):
    def __init__(self, module, num_speakers: int = 2, frame_shift_sec: float = 0.02,
                 rttm_dir=None):
        self.module = module  # (hs, h_lens) -> (logits [B,T,S], lens)
        self.num_speakers = num_speakers
        self.perms = list(itertools.permutations(range(num_speakers)))
        self.frame_shift_sec = frame_shift_sec
        # when set, test-mode reduction dumps hypothesis RTTMs here
        # (reference: s3prl/task/diarization.py writes RTTM at inference)
        self.rttm_dir = rttm_dir
        self.host_keys = ("unique_name",)

    valid_metric = "der"
    valid_higher_better = False

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        logits, out_lens = self.module.apply(
            {"params": params}, hs, h_lens, train=train,
            rngs={"dropout": rng} if train else None,
        )
        B, T, S = logits.shape
        labels = batch["label"].astype(jnp.float32)  # [B, T', S]
        labels = labels[:, :T]
        mask = length_mask(jnp.minimum(out_lens, batch["label_len"]), T, jnp.float32)

        def perm_loss(perm):
            perm_labels = labels[..., jnp.asarray(perm)]
            bce = optax.sigmoid_binary_cross_entropy(logits, perm_labels).mean(-1)
            return (bce * mask).sum(-1) / jnp.maximum(mask.sum(-1), 1.0)  # [B]

        losses = jnp.stack([perm_loss(p) for p in self.perms])  # [P, B]
        best = jnp.argmin(losses, axis=0)  # [B]
        loss = jnp.min(losses, axis=0).mean()
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.int32)
        return loss, {
            "loss": loss,
            "prediction": pred,
            "prediction_len": jnp.minimum(out_lens, batch["label_len"]),
            "label": labels,
            "best_perm": best,
        }

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        acc: Dict[str, float] = {}
        losses = []
        for r in records:
            losses.append(float(r["loss"]))
            preds, labels, lens, best = (
                np.asarray(r["prediction"]),
                np.asarray(r["label"]),
                np.asarray(r["prediction_len"]),
                np.asarray(r["best_perm"]),
            )
            for b in range(len(preds)):
                perm = self.perms[int(best[b])]
                stats = calc_diarization_error(
                    preds[b], labels[b][..., list(perm)], int(lens[b])
                )
                for k, v in stats.items():
                    acc[k] = acc.get(k, 0.0) + v
        denom = max(acc.get("speaker_scored", 0.0), 1.0)
        der = (
            acc.get("speaker_miss", 0.0)
            + acc.get("speaker_falarm", 0.0)
            + acc.get("speaker_error", 0.0)
        ) / denom
        if mode == "test" and self.rttm_dir is not None:
            self._dump_rttm(records)
        return {"der": der, "loss": float(np.mean(losses))}

    def _dump_rttm(self, records) -> None:
        """Hypothesis RTTMs from thresholded activities (one file per batch
        record set, standard `SPEAKER <utt> 1 <start> <dur> ...` lines)."""
        from pathlib import Path

        out_dir = Path(self.rttm_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        shift = self.frame_shift_sec
        with open(out_dir / "hyp.rttm", "w") as f:
            for r in records:
                preds = np.asarray(r["prediction"])
                lens = np.asarray(r["prediction_len"])
                names = r.get("unique_name", [f"utt{i}" for i in range(len(preds))])
                for b in range(len(preds)):
                    name = str(names[b])
                    n = int(lens[b])
                    for s in range(preds.shape[-1]):
                        act = np.concatenate([[0], preds[b, :n, s], [0]])
                        starts = np.flatnonzero(np.diff(act) == 1)
                        ends = np.flatnonzero(np.diff(act) == -1)
                        for st, en in zip(starts, ends):
                            f.write(
                                f"SPEAKER {name} 1 {st * shift:.3f} "
                                f"{(en - st) * shift:.3f} <NA> <NA> spk{s} <NA> <NA>\n"
                            )
