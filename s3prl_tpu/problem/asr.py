"""CTC ASR / phoneme recognition problems (SUPERB ASR / PR).

Behavioral spec from the reference's ASR run procedure
(s3prl/problem/asr/run.py:23 + superb_asr.py:184-252, superb_pr.py:74-97):
stage 0 prepare_data (LibriSpeech train-clean-100 -> CSVs with
transcriptions), stage 1 tokenizer (char for ASR, phoneme+G2P for PR),
stage 2 frozen-upstream BLSTM-CTC training, stage 3 WER/PER evaluation.
"""

from __future__ import annotations

import logging
from pathlib import Path

import pandas as pd
import yaml

from .common import CommonProblem
from ..data.dataset import Speech2TextDataset
from ..data.encoder import CharacterTokenizer, PhonemeTokenizer, load_tokenizer
from ..data.sampler import SortedBucketingSampler, FixedBatchSizeBatchSampler
from ..nn.heads import RNNEncoder
from ..nn.upstream import SUpstream, UpstreamDownstreamModel
from ..task.speech2text_ctc import Speech2TextCTCTask
from ..train.trainer import Trainer, TrainerConfig

logger = logging.getLogger(__name__)


class SuperbASR(CommonProblem):
    """Character CTC on LibriSpeech-100 (reference: superb_asr.py:184-252)."""

    metric = "wer"

    def default_config(self) -> dict:
        return {
            "target_dir": "???",
            "prepare_data": {"librispeech": "???"},
            "build_upstream": {"name": "fbank"},
            "build_downstream": {
                "hidden_size": 1024,
                "num_layers": 2,
                "proj_size": 1024,
                "dropout": 0.2,
            },
            "build_batch_sampler": {"batch_size": 32, "max_length": 16000 * 20},
            "build_optimizer": {"name": "Adam", "lr": 1.0e-4},
            "train": {
                "total_steps": 200000,
                "log_step": 500,
                "eval_step": 5000,
                "save_step": 1000,
                "gradient_clipping": 1.0,
                "gradient_accumulate": 1,
            },
        }

    def prepare_data(self, workspace: Path, config: dict):
        from ..data.corpus.librispeech import prepare_librispeech_asr

        return prepare_librispeech_asr(workspace, **config.get("prepare_data", {}))

    def build_encoder(self, workspace: Path, config: dict):
        df = pd.read_csv(workspace / "train.csv")
        tokenizer = CharacterTokenizer.from_text(df["transcription"].astype(str))
        tokenizer.save(workspace / "tokenizer.json")
        return tokenizer

    def build_downstream(self, output_size: int, **kwargs):
        return RNNEncoder(output_size=output_size, **kwargs)

    def build_task(self, upstream: SUpstream, tokenizer, config: dict):
        downstream = self.build_downstream(
            output_size=tokenizer.vocab_size, **config.get("build_downstream", {})
        )
        module = UpstreamDownstreamModel(
            downstream=downstream, num_layers=upstream.num_layers,
            **config.get("build_featurizer", {}),
        )
        return Speech2TextCTCTask(module, tokenizer, metric=self.metric)

    def build_dataset(self, csv_path, tokenizer):
        return Speech2TextDataset(csv_path, tokenizer)

    def build_batch_sampler(self, dataset, mode: str, config: dict):
        cfg = dict(config.get("build_batch_sampler", {}))
        if mode == "train":
            return SortedBucketingSampler(
                dataset.lengths,
                batch_size=cfg.get("batch_size", 32),
                max_length=cfg.get("max_length", 16000 * 20),
                shuffle=True,
            )
        return FixedBatchSizeBatchSampler(len(dataset), cfg.get("batch_size", 32))

    def _load_encoder(self, workspace: Path):
        return load_tokenizer(workspace / "tokenizer.json")

    # single-file inference decode: greedy CTC (unique-consecutive, drop
    # blanks — reference speech2text_ctc_task.py:112-137)
    def _inference_encoder(self, workspace: Path):
        return self._load_encoder(workspace)

    def _decode_prediction(self, tokenizer, logits) -> str:
        import numpy as np

        ids = np.argmax(logits[0], axis=-1).tolist()
        return tokenizer.decode(ids, ignore_repeat=True)

    def train_stage(self, workspace: Path, config: dict):
        tokenizer = self._load_encoder(workspace)
        upstream = self.build_upstream(**config.get("build_upstream", {}))
        task = self.build_task(upstream, tokenizer, config)
        trainer = Trainer(
            upstream.upstream, task, workspace / "train",
            TrainerConfig(optimizer=config.get("build_optimizer", {"name": "Adam", "lr": 1e-4}),
                          **config.get("train", {})),
        )
        train_loader = self._loader(workspace, "train.csv", tokenizer, "train", config)
        valid_loader = self._loader(workspace, "valid.csv", tokenizer, "valid", config)
        trainer.train(train_loader, valid_loader)
        return trainer

    def evaluate_stage(self, workspace: Path, config: dict):
        tokenizer = self._load_encoder(workspace)
        upstream = self.build_upstream(**config.get("build_upstream", {}))
        task = self.build_task(upstream, tokenizer, config)
        trainer = Trainer(
            upstream.upstream, task, workspace / "train",
            TrainerConfig(optimizer=config.get("build_optimizer", {"name": "Adam", "lr": 1e-4}),
                          **config.get("train", {})),
        )
        from ..train import checkpoint as ckpt

        results = {}
        for csv_path in sorted(workspace.glob("test*.csv")):
            loader = self._loader(workspace, csv_path.name, tokenizer, "test", config)
            first = next(iter(loader))
            trainer.init(first, resume=False)
            best = workspace / "train" / "valid_best"
            load_dir = best if best.exists() else ckpt.latest_checkpoint(workspace / "train")
            if load_dir is not None:
                trainer.params, _, _ = ckpt.load_checkpoint(load_dir, trainer.params)
            results[csv_path.stem] = trainer.evaluate(loader, mode=f"test-{csv_path.stem}")
        with open(workspace / "result.yaml", "w") as f:
            yaml.safe_dump(results, f)
        return results


class SuperbPR(SuperbASR):
    """Phoneme recognition (reference: superb_pr.py:74-97): phoneme tokenizer
    over G2P-converted transcripts, Adam lr 1e-2, 100k steps, accum 2."""

    metric = "per"

    def default_config(self) -> dict:
        cfg = super().default_config()
        cfg["build_optimizer"] = {"name": "Adam", "lr": 1.0e-2}
        cfg["train"]["total_steps"] = 100000
        cfg["train"]["gradient_accumulate"] = 2
        cfg["build_downstream"] = {"hidden_size": 256, "num_layers": 1, "proj_size": 256}
        # batch 16 (superb_pr.py:48; legacy ctc/libriphone.yaml corpus.batch_size)
        cfg["build_batch_sampler"]["batch_size"] = 16
        return cfg

    def build_encoder(self, workspace: Path, config: dict):
        df = pd.read_csv(workspace / "train.csv")
        tokenizer = PhonemeTokenizer.from_text(
            df["transcription"].astype(str), vocab_size=100000
        )
        tokenizer.save(workspace / "tokenizer.json")
        return tokenizer


class SuperbSF(SuperbASR):
    """Slot filling on Audio SNIPS (reference: problem/asr/superb_sf.py):
    character+slot CTC; slot-type F1 and slot-value CER reduction."""

    metric = "slot_type_f1"

    def default_config(self) -> dict:
        cfg = super().default_config()
        cfg["prepare_data"] = {"snips": "???"}
        return cfg

    def prepare_data(self, workspace: Path, config: dict):
        from ..data.corpus.snips import prepare_snips

        return prepare_snips(workspace, **config.get("prepare_data", {}))

    def build_encoder(self, workspace: Path, config: dict):
        from ..data.encoder import CharacterSlotTokenizer

        df = pd.read_csv(workspace / "train.csv")
        tokenizer = CharacterSlotTokenizer.from_text(
            df["transcription"].astype(str), df["iob"].astype(str)
        )
        tokenizer.save(workspace / "tokenizer.json")
        return tokenizer

    def build_dataset(self, csv_path, tokenizer):
        from ..data.dataset import SlotFillingDataset

        return SlotFillingDataset(csv_path, tokenizer)

    def build_task(self, upstream: SUpstream, tokenizer, config: dict):
        from ..task.speech2text_ctc import SlotFillingCTCTask

        downstream = self.build_downstream(
            output_size=tokenizer.vocab_size, **config.get("build_downstream", {})
        )
        module = UpstreamDownstreamModel(
            downstream=downstream, num_layers=upstream.num_layers,
            **config.get("build_featurizer", {}),
        )
        return SlotFillingCTCTask(module, tokenizer)


class AsrExample(SuperbASR):
    """Smoke-test ASR on pseudo audio with toy transcripts."""

    def default_config(self) -> dict:
        cfg = super().default_config()
        cfg["prepare_data"] = {"num_train": 6, "num_valid": 2, "num_test": 2}
        cfg["build_downstream"] = {"hidden_size": 32, "num_layers": 1, "proj_size": 32}
        cfg["build_batch_sampler"] = {"batch_size": 2}
        cfg["train"] = {"total_steps": 4, "log_step": 2, "eval_step": 2, "save_step": 2}
        return cfg

    def prepare_data(self, workspace: Path, config: dict):
        import numpy as np

        from ..util.pseudo_data import _write_wav

        cfg = config.get("prepare_data", {})
        rng = np.random.RandomState(0)
        wav_dir = workspace / "wavs"
        wav_dir.mkdir(parents=True, exist_ok=True)
        texts = ["hello world", "good day", "speech test", "jax on tpu"]
        for split, n in [
            ("train", cfg.get("num_train", 6)),
            ("valid", cfg.get("num_valid", 2)),
            ("test", cfg.get("num_test", 2)),
        ]:
            rows = []
            for i in range(n):
                secs = float(rng.uniform(0.5, 1.5))
                wav = (rng.randn(int(16000 * secs)) * 0.1).astype(np.float32)
                path = wav_dir / f"{split}_{i}.wav"
                _write_wav(path, wav)
                rows.append(dict(id=f"{split}_{i}", wav_path=str(path),
                                 transcription=texts[i % len(texts)], duration=secs))
            pd.DataFrame(rows).to_csv(workspace / f"{split}.csv", index=False)
