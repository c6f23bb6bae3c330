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
