"""Voice conversion task (reference: s3prl/downstream/a2o-vc-vcc2020).

Training: teacher-forced L1 between predicted and target log-mel (the
reference's Taco2-AR objective). Evaluation: mel-cepstral distortion (MCD)
after DTW alignment — the reference shells out to WORLD mcep extraction +
an external vocoder; here MCD is computed over DCT cepstra of the predicted
log-mel (the standard 10*sqrt(2)/ln10 * ||c_hyp - c_ref|| along the DTW
path), waveform synthesis via a vocoder is out of scope this round.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np

from .base import Task
from ..ops.masking import length_mask


def mcd(hyp_mel: np.ndarray, ref_mel: np.ndarray, n_cep: int = 13) -> float:
    """MCD(dB) over DCT cepstra of log-mels, DTW-aligned."""
    from scipy.fftpack import dct

    from ..ops.dtw import cosine_distance_matrix, subsequence_dtw_cost  # noqa: F401

    c_hyp = dct(hyp_mel, type=2, axis=-1, norm="ortho")[:, 1:n_cep]
    c_ref = dct(ref_mel, type=2, axis=-1, norm="ortho")[:, 1:n_cep]
    # plain DP alignment over euclidean distances
    D = np.linalg.norm(c_hyp[:, None, :] - c_ref[None, :, :], axis=-1)
    T1, T2 = D.shape
    acc = np.full((T1, T2), np.inf)
    acc[0, 0] = D[0, 0]
    for i in range(T1):
        for j in range(T2):
            if i == j == 0:
                continue
            best = np.inf
            if i > 0:
                best = min(best, acc[i - 1, j])
            if j > 0:
                best = min(best, acc[i, j - 1])
            if i > 0 and j > 0:
                best = min(best, acc[i - 1, j - 1])
            acc[i, j] = D[i, j] + best
    path_len = T1 + T2
    return float(10.0 * np.sqrt(2.0) / np.log(10.0) * acc[-1, -1] / path_len)


class VoiceConversionTask(Task):
    """module: (hs, h_lens, prev_mels, train) -> (pred_mel[B,T,M], lens)."""

    def __init__(self, module, mel_dim: int = 80, wav_dir=None, gl_iters: int = 32):
        self.module = module
        self.mel_dim = mel_dim
        # when set, test-mode reduction synthesizes waveforms from the
        # predicted mels via the native Griffin-Lim vocoder (ops/vocoder.py;
        # the reference wires an externally-downloaded PWG instead)
        self.wav_dir = wav_dir
        self.gl_iters = gl_iters
        self.host_keys = ("unique_name",)

    valid_metric = "l1"
    valid_higher_better = False

    def init_params(self, key, hs, h_lens, batch):
        B = batch["target_mel"].shape[0]
        prev = jnp.zeros_like(batch["target_mel"])
        return self.module.init(
            {"params": key, "prenet": key}, hs, h_lens, prev
        )["params"]

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        target = batch["target_mel"]  # [B, T, M]
        # teacher forcing: prev = target shifted right by one frame
        prev = jnp.concatenate([jnp.zeros_like(target[:, :1]), target[:, :-1]], 1)
        pred, out_lens = self.module.apply(
            {"params": params}, hs, h_lens, prev, train=train,
            rngs={"prenet": rng, "dropout": rng},
        )
        T = min(pred.shape[1], target.shape[1])
        valid = length_mask(jnp.minimum(out_lens, batch["target_mel_len"]), T, jnp.float32)
        l1 = jnp.abs(pred[:, :T] - target[:, :T]).mean(-1)
        loss = (l1 * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        return loss, {
            "loss": loss, "l1": loss, "pred_mel": pred[:, :T],
            "target_mel": target[:, :T],
            "lens": jnp.minimum(out_lens, batch["target_mel_len"]),
        }

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        losses = [float(r["loss"]) for r in records]
        mcds = []
        for r in records[:4]:  # MCD on a few batches (O(T^2) DP on host)
            pred, tgt, lens = np.asarray(r["pred_mel"]), np.asarray(r["target_mel"]), np.asarray(r["lens"])
            for b in range(min(len(pred), 2)):
                n = int(lens[b])
                if n > 4:
                    mcds.append(mcd(pred[b, :n], tgt[b, :n]))
        out = {"loss": float(np.mean(losses)), "l1": float(np.mean(losses))}
        if mcds:
            out["mcd"] = float(np.mean(mcds))
        if mode == "test" and self.wav_dir is not None:
            self._synthesize(records)
        return out

    def _synthesize(self, records) -> None:
        from pathlib import Path

        from ..ops.vocoder import log_mel_to_wav
        from ..util.pseudo_data import _write_wav

        out_dir = Path(self.wav_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for r in records:
            pred, lens = np.asarray(r["pred_mel"]), np.asarray(r["lens"])
            names = r.get("unique_name", [f"utt{i}" for i in range(len(pred))])
            wavs = np.asarray(
                log_mel_to_wav(jnp.asarray(pred), n_mels=self.mel_dim,
                               n_iter=self.gl_iters)
            )
            for b in range(len(pred)):
                n_samp = max(int(lens[b]) - 1, 1) * 160
                _write_wav(out_dir / f"{names[b]}.wav", wavs[b, :n_samp])
