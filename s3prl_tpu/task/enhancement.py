"""Speech enhancement / separation tasks (SUPERB-SG SE / SS).

Behavioral spec from the reference (s3prl/downstream/enhancement_stft,
separation_stft(2)): a BLSTM mask head over upstream features predicts one
(SE) or `num_sources` (SS) sigmoid masks on the mixture's STFT magnitude;
training minimizes magnitude-domain MSE (PSA-style), SS resolves source
permutation with PIT; evaluation reconstructs waveforms with the mixture
phase (iSTFT) and reports SI-SDR(i).
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .base import Task
from ..ops.audio import istft, stft_complex
from ..ops.masking import length_mask

N_FFT = 512
HOP = 160
WIN = 400


def si_sdr(est: np.ndarray, ref: np.ndarray, eps: float = 1e-8) -> float:
    """Scale-invariant SDR in dB (reference metric for SS/SE)."""
    est = est - est.mean()
    ref = ref - ref.mean()
    alpha = (est * ref).sum() / max((ref ** 2).sum(), eps)
    target = alpha * ref
    noise = est - target
    return float(10 * np.log10(max((target ** 2).sum(), eps) / max((noise ** 2).sum(), eps)))


class SeparationTask(Task):
    """module: (hs, h_lens) -> (masks[B, T, S * n_freq], lens)."""

    def __init__(self, module, num_sources: int = 2, n_fft: int = N_FFT):
        self.module = module
        self.num_sources = num_sources
        self.n_freq = n_fft // 2 + 1
        self.perms = list(itertools.permutations(range(num_sources)))
        self.host_keys = ("unique_name",)

    def loss_and_cache(self, params, hs, h_lens, batch, rng, train):
        out, out_lens = self.module.apply(
            {"params": params}, hs, h_lens, train=train,
            rngs={"dropout": rng} if train else None,
        )
        B, T, _ = out.shape
        masks = jax.nn.sigmoid(out.reshape(B, T, self.num_sources, self.n_freq))

        mix_spec = stft_complex(batch["x"], n_fft=N_FFT, hop_length=HOP, win_length=WIN)
        mix_mag = jnp.abs(mix_spec)  # [B, F, n_freq]

        # clean targets: [B, S, T_wav] -> magnitudes; sources may be padded to
        # a different length than the bucketed mixture -> trim to common frames
        refs = batch["sources"]  # [B, S, T_wav]
        ref_mag = jnp.abs(
            stft_complex(
                refs.reshape(-1, refs.shape[-1]), n_fft=N_FFT, hop_length=HOP, win_length=WIN
            )
        ).reshape(B, self.num_sources, -1, self.n_freq)
        Tm = min(T, mix_mag.shape[1], ref_mag.shape[2])
        masks = masks[:, :Tm]
        mix_mag_t = mix_mag[:, :Tm]
        ref_mag = ref_mag[:, :, :Tm]

        valid = length_mask(jnp.minimum(out_lens, Tm), Tm, jnp.float32)[..., None]

        def perm_loss(perm):
            est = masks[:, :, jnp.asarray(perm)] * mix_mag_t[:, :, None, :]
            est = jnp.transpose(est, (0, 2, 1, 3))  # [B, S, T, F]
            err = ((est - ref_mag) ** 2).mean(axis=(1, 3))  # [B, T]
            return (err * valid[..., 0]).sum(-1) / jnp.maximum(valid[..., 0].sum(-1), 1.0)

        losses = jnp.stack([perm_loss(p) for p in self.perms])  # [P, B]
        best = jnp.argmin(losses, axis=0)
        loss = jnp.min(losses, axis=0).mean()
        cache = {
            "loss": loss,
            "masks": masks,
            "best_perm": best,
            "out_lens": jnp.minimum(out_lens, Tm),
        }
        if not train:
            # eval cache carries reconstructed waveforms + references so the
            # host-side reduction can score si_sdr(/stoi/pesq) per utterance,
            # matching the reference's dev/test metric flow
            # (separation_stft2/expert.py:255-300, enhancement_stft:299)
            cache["est_wav"] = self.reconstruct(masks, batch["x"], batch["x"].shape[1])
            cache["x"] = batch["x"]
            cache["x_len"] = batch["x_len"]
            cache["sources"] = batch["sources"]
        return loss, cache

    #: metrics scored on reconstructed waveforms during valid/test; SS scores
    #: si_sdr only, SE adds stoi+pesq (reference COMPUTE_METRICS lists,
    #: separation_stft2/expert.py:38 vs enhancement_stft/expert.py:38)
    compute_metrics: tuple = ("si_sdr",)

    # reference separation_stft2/expert.py:356: dev-best by mean si_sdr
    valid_metric = "si_sdr"
    valid_higher_better = True

    def reduction(self, mode: str, records: List[Dict[str, Any]]) -> Dict[str, float]:
        logs = {"loss": float(np.mean([float(r["loss"]) for r in records]))}
        if mode == "train" or not records or "est_wav" not in records[0]:
            return logs
        from ..metric.quality import pesq as pesq_fn
        from ..metric.quality import stoi as stoi_fn

        vals: Dict[str, list] = {m: [] for m in self.compute_metrics}
        vals["si_sdri"] = []
        for r in records:
            est, mix, refs = r["est_wav"], r["x"], r["sources"]
            for b in range(len(est)):
                n = int(r["x_len"][b])
                perm = self.perms[int(r["best_perm"][b])]
                e = est[b][list(perm)]  # PIT ordering from the loss, as in
                # the reference eval (compute_permutation=False over the
                # PIT-ordered hypotheses)
                sdrs = [si_sdr(e[s, :n], refs[b, s, :n]) for s in range(self.num_sources)]
                base = [si_sdr(mix[b, :n], refs[b, s, :n]) for s in range(self.num_sources)]
                vals["si_sdr"].append(float(np.mean(sdrs)))
                vals["si_sdri"].append(float(np.mean(sdrs) - np.mean(base)))
                if "stoi" in vals:
                    vals["stoi"].append(stoi_fn(refs[b, 0, :n], e[0, :n], 16000))
                if "pesq" in vals:
                    vals["pesq"].append(
                        pesq_fn(refs[b, 0, :n], e[0, :n], 16000))
        for k, v in vals.items():
            if v:
                logs[k] = float(np.nanmean(v))
        return logs

    def reconstruct(self, masks: jnp.ndarray, mixture: jnp.ndarray, length: int):
        """masks[B, T, S, F] + mixture wav -> separated wavs [B, S, length]."""
        spec = stft_complex(mixture, n_fft=N_FFT, hop_length=HOP, win_length=WIN)
        T = min(masks.shape[1], spec.shape[1])
        est = masks[:, :T].transpose(0, 2, 1, 3) * spec[:, None, :T]
        B, S = est.shape[:2]
        wav = istft(
            est.reshape(B * S, T, -1), n_fft=N_FFT, hop_length=HOP, win_length=WIN,
            length=length,
        )
        return wav.reshape(B, S, -1)


class EnhancementTask(SeparationTask):
    """Single-source masking (SE): same machinery with num_sources=1; the
    reference's enhancement_stft uses the same STFT-mask head."""

    def __init__(self, module, n_fft: int = N_FFT):
        super().__init__(module, num_sources=1, n_fft=n_fft)

    # reference enhancement_stft/expert.py:38,383-385: SE scores all three
    # metrics and tracks the dev-best checkpoint by mean PESQ. The metric is
    # reported as ``pesq``: metric/quality.pesq implements the P.862
    # perceptual model with the reference implementation's published band
    # tables and constants (self-validating — quality.py module docstring
    # lists the three documented deviations, all immaterial for same-clock
    # SE signals).
    compute_metrics = ("si_sdr", "stoi", "pesq")
    valid_metric = "pesq"
    valid_higher_better = True
