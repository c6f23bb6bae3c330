"""Voice conversion problem (reference: s3prl/downstream/a2o-vc-vcc2020).

Stage 0: VCC2020-style data — source-speaker utterances paired with target-
speaker references sharing the transcript; CSVs carry the source wav and the
target wav whose log-mel is the training target. Stage 1 train the Taco2-AR
decoder over frozen upstream features (frame-aligned to the target mel via
trim). Stage 2 evaluate DTW-MCD and synthesize waveforms with the native
Griffin-Lim vocoder (ops/vocoder.py; the reference downloads an external
neural vocoder instead).
"""

from __future__ import annotations

import logging
from pathlib import Path

import flax.linen as nn
import numpy as np
import pandas as pd
import yaml

from .base import Problem
from ..data.collate import Buckets, pad_collate
from ..data.dataset import _CsvDataset
from ..data.loader import DataLoader
from ..data.sampler import FixedBatchSizeBatchSampler
from ..models.taco2ar import Taco2ARConfig, Taco2ARDecoder
from ..nn.upstream import SUpstream
from ..ops import audio as audio_ops
from ..task.voice_conversion import VoiceConversionTask
from ..train.trainer import Trainer, TrainerConfig

logger = logging.getLogger(__name__)


class _VcDataset(_CsvDataset):
    """Rows: wav_path (source audio), target_path (target-speaker audio)."""

    def __getitem__(self, i):
        import jax.numpy as jnp

        from ..data.audio import load_wav

        row = self.df.iloc[i]
        wav = self._load_wav(row)
        target_wav, _ = load_wav(row.get("target_path", row["wav_path"]), self.sample_rate)
        mel, _ = audio_ops.log_mel(jnp.asarray(target_wav[None]), n_mels=80)
        return {
            "x": wav,
            "target_mel": np.asarray(mel)[0],
            "unique_name": str(row["id"]),
        }


class VcVcc2020(Problem):
    STAGES = ["prepare_data", "train_stage", "evaluate_stage"]

    def default_config(self) -> dict:
        return {
            "target_dir": "???",
            "prepare_data": {"vcc2020": "???", "target_speaker": "TEF1"},
            "build_upstream": {"name": "fbank"},
            "build_downstream": {"lstm_units": 512, "num_lstm_layers": 2},
            "build_batch_sampler": {"batch_size": 6},
            # AdamW 1e-4, 10k steps, batch 6 (legacy a2o-vc-vcc2020/
            # config.yaml; the a2a-vc-vctk variant trains 50k)
            "build_optimizer": {"name": "AdamW", "lr": 1.0e-4},
            "train": {"total_steps": 10000, "log_step": 500, "eval_step": 2000, "save_step": 1000},
        }

    def prepare_data(self, workspace: Path, config: dict):
        """VCC2020 layout: <root>/<speaker>/<utt>.wav; parallel utt ids."""
        cfg = config["prepare_data"]
        root = Path(cfg["vcc2020"])
        target_spk = cfg.get("target_speaker", "TEF1")
        src_spks = cfg.get("source_speakers", ["SEF1", "SEF2", "SEM1", "SEM2"])
        rows = []
        for spk in src_spks:
            for wav in sorted((root / spk).glob("*.wav")):
                tgt = root / target_spk / wav.name
                if tgt.exists():
                    rows.append(dict(id=f"{spk}-{wav.stem}", wav_path=str(wav), target_path=str(tgt)))
        df = pd.DataFrame(rows)
        n_valid = max(len(df) // 10, 1)
        df.iloc[n_valid:].to_csv(workspace / "train.csv", index=False)
        df.iloc[:n_valid].to_csv(workspace / "valid.csv", index=False)
        df.iloc[:n_valid].to_csv(workspace / "test.csv", index=False)

    def build_task(self, upstream: SUpstream, config: dict):
        d_cfg = config.get("build_downstream", {})

        class Model(nn.Module):
            num_layers: int = upstream.num_layers

            @nn.compact
            def __call__(self, hs, h_lens, prev_mels, train=False):
                from ..nn.upstream import Featurizer

                h, lens = Featurizer(num_layers=self.num_layers, name="featurizer")(hs, h_lens)
                pred = Taco2ARDecoder(
                    Taco2ARConfig(mel_dim=80, **d_cfg), name="decoder"
                )(h[:, : prev_mels.shape[1]], prev_mels, train=train)
                return pred, lens

        return VoiceConversionTask(Model(), mel_dim=80)

    def _loader(self, workspace, csv_name, mode, config):
        csv_path = workspace / csv_name
        if not csv_path.exists():
            return None
        ds = _VcDataset(csv_path)
        cfg = config.get("build_batch_sampler", {})
        sampler = FixedBatchSizeBatchSampler(len(ds), cfg.get("batch_size", 6), shuffle=(mode == "train"))
        buckets = Buckets.linear(config.get("bucket_step", 16000), 16000 * 30)
        return DataLoader(ds, sampler, lambda items: pad_collate(items, buckets))

    def _trainer(self, workspace, config):
        upstream = SUpstream(**config.get("build_upstream", {"name": "fbank"}))
        task = self.build_task(upstream, config)
        return Trainer(
            upstream.upstream, task, workspace / "train",
            TrainerConfig(optimizer=config.get("build_optimizer", {"name": "Adam", "lr": 1e-4}),
                          **config.get("train", {})),
        )

    def train_stage(self, workspace: Path, config: dict):
        trainer = self._trainer(workspace, config)
        trainer.train(
            self._loader(workspace, "train.csv", "train", config),
            self._loader(workspace, "valid.csv", "valid", config),
        )
        return trainer

    def evaluate_stage(self, workspace: Path, config: dict):
        from ..train import checkpoint as ckpt

        trainer = self._trainer(workspace, config)
        loader = self._loader(workspace, "test.csv", "test", config)
        first = next(iter(loader))
        trainer.init(first, resume=False)
        best = workspace / "train" / "valid_best"
        load_dir = best if best.exists() else ckpt.latest_checkpoint(workspace / "train")
        if load_dir is not None:
            trainer.params, _, _ = ckpt.load_checkpoint(load_dir, trainer.params)
        # synthesize converted waveforms next to the scores (Griffin-Lim;
        # the reference uses an externally-downloaded PWG vocoder here)
        if config.get("synthesize", True):
            trainer.task.wav_dir = workspace / "wav_hyp"
        logs = trainer.evaluate(loader, mode="test")
        with open(workspace / "result.yaml", "w") as f:
            yaml.safe_dump({"test": logs}, f)
        return {"test": logs}


class VcExample(VcVcc2020):
    """Smoke test: identity 'conversion' on pseudo audio."""

    def default_config(self) -> dict:
        cfg = super().default_config()
        cfg["prepare_data"] = {"num": 6}
        cfg["build_downstream"] = {"lstm_units": 24, "num_lstm_layers": 1,
                                   "prenet_units": 16, "postnet_channels": 16, "postnet_layers": 2}
        cfg["build_batch_sampler"] = {"batch_size": 2}
        cfg["train"] = {"total_steps": 2, "log_step": 1, "eval_step": 2, "save_step": 2}
        return cfg

    def prepare_data(self, workspace: Path, config: dict):
        from ..util.pseudo_data import _write_wav

        rng = np.random.RandomState(0)
        (workspace / "wavs").mkdir(parents=True, exist_ok=True)
        for split, n in [("train", config["prepare_data"].get("num", 6)), ("valid", 2), ("test", 2)]:
            rows = []
            for i in range(n):
                wav = (rng.randn(int(16000 * rng.uniform(0.4, 0.8))) * 0.1).astype(np.float32)
                p = workspace / "wavs" / f"{split}_{i}.wav"
                _write_wav(p, wav)
                rows.append(dict(id=f"{split}_{i}", wav_path=str(p), target_path=str(p)))
            pd.DataFrame(rows).to_csv(workspace / f"{split}.csv", index=False)
