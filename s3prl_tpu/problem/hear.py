"""HEAR 2021 benchmark problems.

Behavioral spec from the reference (s3prl/problem/common/hear_*.py — 16
recipes over two shared task shapes): every HEAR dataset is either a *scene*
task (one (multi)label per clip; e.g. hear_esc50, hear_gsc5hr,
hear_cremad, hear_vocal, hear_libricount, ...) or a *timestamp/event* task
(frame-level multilabel; hear_dcase, hear_maestro). Data comes from the
standardized HEAR task folders; here prepare_data consumes CSVs with
`label` (scene) or `events` (event) columns.
"""

from __future__ import annotations

import logging
from pathlib import Path

import pandas as pd

from .base import Problem
from .common import CommonProblem
from ..nn.heads import UtteranceLevel
from ..nn.upstream import SUpstream, UpstreamDownstreamModel
from ..task.hear import ScenePredictionTask

logger = logging.getLogger(__name__)


class HearScene(CommonProblem):
    """Generic HEAR scene-prediction recipe (clip-level classification)."""

    dataset_name = "hear_generic"

    def default_config(self) -> dict:
        return {
            "target_dir": "???",
            "prepare_data": {"task_dir": "???"},
            "build_upstream": {"name": "fbank"},
            "build_downstream": {"hidden_size": 1024},
            "build_batch_sampler": {"batch_size": 32},
            "build_optimizer": {"name": "Adam", "lr": 1.0e-3},
            "train": {
                "total_steps": 40000, "log_step": 100,
                "eval_step": 1000, "save_step": 1000,
            },
        }

    def prepare_data(self, workspace: Path, config: dict):
        """HEAR task folders ship {train,valid,test}.json: {clip: label(s)}."""
        import json

        task_dir = Path(config["prepare_data"]["task_dir"])
        for split in ["train", "valid", "test"]:
            meta = task_dir / f"{split}.json"
            if not meta.exists():
                continue
            entries = json.loads(meta.read_text())
            rows = [
                dict(id=clip.replace("/", "-"),
                     wav_path=str(task_dir / "audio" / clip),
                     label=str(label if not isinstance(label, list) else label[0]))
                for clip, label in entries.items()
            ]
            pd.DataFrame(rows).to_csv(workspace / f"{split}.csv", index=False)

    def build_task(self, upstream: SUpstream, encoder, config: dict):
        downstream = UtteranceLevel(
            output_size=len(encoder),
            hidden_sizes=(config.get("build_downstream", {}).get("hidden_size", 1024),),
        )
        module = UpstreamDownstreamModel(
            downstream=downstream, num_layers=upstream.num_layers,
            **config.get("build_featurizer", {}),
        )
        return ScenePredictionTask(module, num_classes=len(encoder))


def _make_scene_recipe(name: str):
    cls = type(name, (HearScene,), {"dataset_name": name})
    return cls


# the 16 reference recipes (problem/__init__.py:5-30 Hear* list); all share
# the two task shapes above — each class pins its dataset name
HearFSD = _make_scene_recipe("HearFSD")
HearESC50 = _make_scene_recipe("HearESC50")
HearBeijingOpera = _make_scene_recipe("HearBeijingOpera")
HearCremaD = _make_scene_recipe("HearCremaD")
HearGSC5hr = _make_scene_recipe("HearGSC5hr")
HearGunshot = _make_scene_recipe("HearGunshot")
HearLibriCount = _make_scene_recipe("HearLibriCount")
HearMridangamStroke = _make_scene_recipe("HearMridangamStroke")
HearMridangamTonic = _make_scene_recipe("HearMridangamTonic")
HearNsynthPitch5hr = _make_scene_recipe("HearNsynthPitch5hr")
HearSpeechCommands5hr = _make_scene_recipe("HearSpeechCommands5hr")
HearTonicMonophonic = _make_scene_recipe("HearTonicMonophonic")
HearVocalImitation = _make_scene_recipe("HearVocalImitation")
HearVoxLingua = _make_scene_recipe("HearVoxLingua")
HearDcase = _make_scene_recipe("HearDcase")  # event task; timestamp head TODO
HearMaestro = _make_scene_recipe("HearMaestro")  # event task; timestamp head TODO


class _EventDataset:
    """CSV rows: wav_path + events_path (.npy [T, num_classes] frame labels)."""

    def __init__(self, csv_path, sample_rate=16000):
        self.df = pd.read_csv(csv_path)
        self.sample_rate = sample_rate

    def __len__(self):
        return len(self.df)

    def __getitem__(self, i):
        import numpy as np

        from ..data.audio import load_wav

        row = self.df.iloc[i]
        wav, _ = load_wav(row["wav_path"], self.sample_rate)
        labels = np.load(row["events_path"]).astype(np.int32)
        return {"x": wav, "frame_labels": labels, "unique_name": str(row["id"])}


class HearEvent(Problem):
    """Timestamp (event) HEAR recipes — hear_dcase / hear_maestro."""

    STAGES = ["prepare_data", "train_stage", "evaluate_stage"]

    def default_config(self) -> dict:
        return {
            "target_dir": "???",
            "prepare_data": {"task_dir": "???"},
            "build_upstream": {"name": "fbank"},
            "build_downstream": {"hidden_size": 256},
            "num_classes": "???",
            "build_batch_sampler": {"batch_size": 8},
            "build_optimizer": {"name": "Adam", "lr": 1.0e-3},
            "train": {"total_steps": 40000, "log_step": 100, "eval_step": 1000, "save_step": 1000},
        }

    def prepare_data(self, workspace: Path, config: dict):
        raise NotImplementedError("provide CSVs with events_path frame labels")

    def build_task(self, upstream: SUpstream, config: dict):
        from ..nn.heads import FrameLevel
        from ..task.hear import EventPredictionTask

        num_classes = config["num_classes"]
        downstream = FrameLevel(
            output_size=num_classes,
            hidden_sizes=(config.get("build_downstream", {}).get("hidden_size", 256),),
        )
        module = UpstreamDownstreamModel(
            downstream=downstream, num_layers=upstream.num_layers,
            **config.get("build_featurizer", {}),
        )
        return EventPredictionTask(module, num_classes=num_classes)

    def _loader(self, workspace, csv_name, mode, config):
        from ..data.collate import Buckets, pad_collate
        from ..data.loader import DataLoader
        from ..data.sampler import FixedBatchSizeBatchSampler

        csv_path = workspace / csv_name
        if not csv_path.exists():
            return None
        ds = _EventDataset(csv_path)
        cfg = config.get("build_batch_sampler", {})
        sampler = FixedBatchSizeBatchSampler(len(ds), cfg.get("batch_size", 8), shuffle=(mode == "train"))
        buckets = Buckets.linear(config.get("bucket_step", 16000), 16000 * 30)
        return DataLoader(ds, sampler, lambda items: pad_collate(items, buckets))

    def _trainer(self, workspace, config):
        from ..train.trainer import Trainer, TrainerConfig

        upstream = SUpstream(**config.get("build_upstream", {"name": "fbank"}))
        task = self.build_task(upstream, config)
        return Trainer(
            upstream.upstream, task, workspace / "train",
            TrainerConfig(optimizer=config.get("build_optimizer", {"name": "Adam", "lr": 1e-3}),
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
        import yaml as _yaml

        from ..train import checkpoint as ckpt

        trainer = self._trainer(workspace, config)
        loader = self._loader(workspace, "test.csv", "test", config)
        first = next(iter(loader))
        trainer.init(first, resume=False)
        best = workspace / "train" / "valid_best"
        load_dir = best if best.exists() else ckpt.latest_checkpoint(workspace / "train")
        if load_dir is not None:
            trainer.params, _, _ = ckpt.load_checkpoint(load_dir, trainer.params)
        logs = trainer.evaluate(loader, mode="test")
        with open(workspace / "result.yaml", "w") as f:
            _yaml.safe_dump({"test": logs}, f)
        return {"test": logs}


class HearEventExample(HearEvent):
    """Smoke test: synthesized tone-burst events."""

    def default_config(self) -> dict:
        cfg = super().default_config()
        cfg["prepare_data"] = {"num": 6}
        cfg["num_classes"] = 2
        cfg["build_downstream"] = {"hidden_size": 16}
        cfg["build_batch_sampler"] = {"batch_size": 2}
        cfg["train"] = {"total_steps": 4, "log_step": 2, "eval_step": 2, "save_step": 2}
        return cfg

    def prepare_data(self, workspace: Path, config: dict):
        import numpy as np

        from ..util.pseudo_data import _write_wav

        rng = np.random.RandomState(0)
        (workspace / "wavs").mkdir(parents=True, exist_ok=True)
        (workspace / "events").mkdir(parents=True, exist_ok=True)
        for split, n in [("train", config["prepare_data"].get("num", 6)), ("valid", 2), ("test", 2)]:
            rows = []
            for i in range(n):
                T = 16000
                wav = rng.randn(T).astype(np.float32) * 0.05
                n_frames = T // 160
                labels = np.zeros((n_frames, 2), np.int32)
                start = rng.randint(10, n_frames - 30)
                cls = i % 2
                wav[start * 160:(start + 20) * 160] += np.sin(
                    2 * np.pi * (440 if cls == 0 else 880) * np.arange(20 * 160) / 16000
                ).astype(np.float32) * 0.3
                labels[start:start + 20, cls] = 1
                wp = workspace / "wavs" / f"{split}_{i}.wav"
                ep = workspace / "events" / f"{split}_{i}.npy"
                _write_wav(wp, wav)
                np.save(ep, labels)
                rows.append(dict(id=f"{split}_{i}", wav_path=str(wp), events_path=str(ep)))
            pd.DataFrame(rows).to_csv(workspace / f"{split}.csv", index=False)
