"""Speaker verification task (SUPERB ASV).

Behavioral spec from the reference's SpeakerVerification task
(s3prl/task/speaker_verification_task.py:62-209): train a speaker classifier
with AM-softmax margin loss over x-vector style embeddings; evaluate by
cosine-scoring trial pairs and reducing to EER / minDCF.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .base import Task
from ..metric import compute_eer, compute_minDCF


def amsoftmax_logits(
    embs: jnp.ndarray,  # [B, D]
    weight: jnp.ndarray,  # [D, C] (column-normalized at use)
    labels: jnp.ndarray,  # [B]
    margin: float = 0.4,
    scale: float = 30.0,
) -> jnp.ndarray:
    """Additive-margin softmax logits (reference: nn/speaker_loss.py amsoftmax)."""
    w = weight / jnp.maximum(jnp.linalg.norm(weight, axis=0, keepdims=True), 1e-8)
    e = embs / jnp.maximum(jnp.linalg.norm(embs, axis=-1, keepdims=True), 1e-8)
    cos = e @ w  # [B, C]
    onehot = jax.nn.one_hot(labels, cos.shape[-1], dtype=cos.dtype)
    return scale * (cos - margin * onehot)


class SpeakerVerificationTask(Task):
    """Training = AM-softmax classification; testing = trial cosine scoring.

    Test batches carry paired utterances; the problem layer computes
    embeddings per utterance and calls `score_trials`.
    """

    def __init__(self, module, num_speakers: int, margin: float = 0.4, scale: float = 30.0):
        self.module = module  # maps (hs, h_lens) -> embeddings [B, D]
        self.num_speakers = num_speakers
        self.margin = margin
        self.scale = scale
        self.host_keys = ("unique_name",)

    valid_metric = "eer"
    valid_higher_better = False

    def init_params(self, key, hs, h_lens, batch):
        k1, k2 = jax.random.split(key)
        params = self.module.init(k1, hs, h_lens)["params"]
        emb = self.module.apply({"params": params}, hs, h_lens)
        if isinstance(emb, tuple):
            emb = emb[0]
        params["am_weight"] = jax.random.normal(
            k2, (emb.shape[-1], self.num_speakers), jnp.float32
        ) * 0.01
        return params

    def _embed(self, params, hs, h_lens, rng=None, train=False):
        module_params = {k: v for k, v in params.items() if k != "am_weight"}
        emb = self.module.apply(
            {"params": module_params}, hs, h_lens, train=train,
            rngs={"dropout": rng} if train else None,
        )
        return emb[0] if isinstance(emb, tuple) else emb

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        emb = self._embed(params, hs, h_lens, rng, train)
        labels = batch["class_id"]
        logits = amsoftmax_logits(emb, params["am_weight"], labels, self.margin, self.scale)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        pred = jnp.argmax(logits, axis=-1)
        return loss, {"loss": loss, "prediction": pred, "label": labels, "embedding": emb}

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        preds = np.concatenate([r["prediction"] for r in records])
        labels = np.concatenate([r["label"] for r in records])
        losses = [float(r["loss"]) for r in records]
        return {"accuracy": float((preds == labels).mean()), "loss": float(np.mean(losses))}

    @staticmethod
    def score_trials(
        emb_by_name: Dict[str, np.ndarray], trials: List[Tuple[int, str, str]]
    ) -> Dict[str, float]:
        """trials: (label, name_a, name_b) -> EER/minDCF over cosine scores."""
        scores, labels = [], []
        for label, a, b in trials:
            ea, eb = emb_by_name[a], emb_by_name[b]
            s = float(ea @ eb / (np.linalg.norm(ea) * np.linalg.norm(eb) + 1e-8))
            scores.append(s)
            labels.append(int(label))
        eer, _ = compute_eer(labels, scores)
        mindcf, _ = compute_minDCF(labels, scores)
        return {"eer": eer, "minDCF": mindcf}


def ge2e_loss(
    embs: jnp.ndarray,  # [N_spk, M_utt, D]
    w: jnp.ndarray,  # learned scale (init 10.0)
    b: jnp.ndarray,  # learned bias (init -5.0)
) -> jnp.ndarray:
    """Generalized end-to-end softmax loss (reference: downstream/
    voxceleb2_ge2e — GE2E, Wan et al. 2018): each utterance is scored
    against every speaker centroid (own centroid excludes the utterance)
    and trained with softmax CE toward its own speaker.
    """
    N, M, D = embs.shape
    e = embs / jnp.maximum(jnp.linalg.norm(embs, axis=-1, keepdims=True), 1e-8)
    centroids = e.mean(axis=1)  # [N, D]
    # exclusive centroids for own-speaker similarity
    sums = e.sum(axis=1, keepdims=True)  # [N, 1, D]
    excl = (sums - e) / (M - 1)  # [N, M, D]
    excl = excl / jnp.maximum(jnp.linalg.norm(excl, axis=-1, keepdims=True), 1e-8)
    cent_n = centroids / jnp.maximum(jnp.linalg.norm(centroids, axis=-1, keepdims=True), 1e-8)

    sim = jnp.einsum("nmd,kd->nmk", e, cent_n)  # [N, M, N]
    own = jnp.einsum("nmd,nmd->nm", e, excl)  # [N, M]
    eye = jnp.eye(N, dtype=bool)[:, None, :]
    sim = jnp.where(eye, own[..., None], sim)
    logits = w * sim + b
    labels = jnp.broadcast_to(jnp.arange(N)[:, None], (N, M))
    import optax as _optax

    return _optax.softmax_cross_entropy_with_integer_labels(
        logits.reshape(N * M, N), labels.reshape(N * M)
    ).mean()


class Ge2eVerificationTask(SpeakerVerificationTask):
    """GE2E-trained speaker verification (reference: downstream/
    voxceleb2_ge2e/expert.py:118-133): batches are speaker-grouped
    [N_spk * M_utt] (GE2EBatchSampler order), embeddings reshape to
    [N, M, D] for the GE2E softmax loss; trials score by cosine like the
    AM-softmax task. The scale/bias (w init 10, b init -5) are trained
    parameters (GE2E, Wan et al. 2018)."""

    def __init__(self, module, utts_per_speaker: int = 10):
        self.module = module
        self.utts_per_speaker = utts_per_speaker
        self.host_keys = ("unique_name",)

    valid_metric = "loss"
    valid_higher_better = False

    def init_params(self, key, hs, h_lens, batch):
        params = self.module.init(key, hs, h_lens)["params"]
        params["ge2e_w"] = jnp.float32(10.0)
        params["ge2e_b"] = jnp.float32(-5.0)
        return params

    def _embed(self, params, hs, h_lens, rng=None, train=False):
        module_params = {k: v for k, v in params.items()
                         if k not in ("ge2e_w", "ge2e_b")}
        emb = self.module.apply(
            {"params": module_params}, hs, h_lens, train=train,
            rngs={"dropout": rng} if train else None,
        )
        return emb[0] if isinstance(emb, tuple) else emb

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        emb = self._embed(params, hs, h_lens, rng, train)
        M = self.utts_per_speaker
        B, D = emb.shape
        N = B // M
        # GE2E's w must stay positive (Wan et al. 2018 eq. 5 gradient note)
        w = jnp.maximum(params["ge2e_w"], 1e-6)
        loss = ge2e_loss(emb[: N * M].reshape(N, M, D), w, params["ge2e_b"])
        return loss, {"loss": loss, "embedding": emb}

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        return {"loss": float(np.mean([float(r["loss"]) for r in records]))}
