"""End-to-end tests for the named HEAR recipes (tiny synthetic task dirs in
the official HEAR folder layout)."""

import json

import numpy as np


def _write_wavs(audio_dir, names, rng, secs=0.5):
    from s3prl_tpu.util.pseudo_data import _write_wav

    audio_dir.mkdir(parents=True, exist_ok=True)
    for n in names:
        _write_wav(audio_dir / n, (rng.randn(int(16000 * secs)) * 0.1).astype(np.float32))


def _small(cls, **extra):
    class Tiny(cls):
        pass

    def default_config(self):
        cfg = cls.default_config(self)
        cfg["build_downstream"] = {"hidden_size": 16}
        cfg["build_batch_sampler"] = {"batch_size": 2}
        cfg["train"] = {"total_steps": 4, "log_step": 2, "eval_step": 2, "save_step": 2}
        cfg.update(extra)
        return cfg

    Tiny.default_config = default_config
    return Tiny()


def test_hear_fsd_multilabel(tmp_path):
    """train/valid/test.json layout, multilabel, hear-eval score set."""
    from s3prl_tpu.problem import HearFSD

    rng = np.random.RandomState(0)
    task_dir = tmp_path / "task"
    for split, n in (("train", 6), ("valid", 2), ("test", 2)):
        names = [f"{split}_{i}.wav" for i in range(n)]
        _write_wavs(task_dir / "audio" / split, names, rng)
        meta = {
            name: (["dog", "bark"] if i % 2 == 0 else ["cat"])
            for i, name in enumerate(names)
        }
        (task_dir / f"{split}.json").write_text(json.dumps(meta))

    problem = _small(HearFSD, prepare_data={"task_dir": str(task_dir)})
    ws = tmp_path / "ws"
    cfg = problem.default_config()
    cfg.pop("target_dir")
    results = problem.run(str(ws), **cfg)
    logs = results["evaluate_stage"]["test"]
    for score in ("mAP", "top1_acc", "d_prime", "aucroc"):
        assert score in logs and np.isfinite(logs[score])


def test_hear_esc50_kfold(tmp_path):
    """fold{i}.json layout: test fold held out, valid = next fold."""
    from s3prl_tpu.problem import HearESC50

    rng = np.random.RandomState(1)
    task_dir = tmp_path / "task"
    for fold in range(5):
        names = [f"f{fold}_{i}.wav" for i in range(3)]
        _write_wavs(task_dir / "audio" / f"fold{fold:02d}", names, rng)
        meta = {name: ["a", "b", "c"][i % 3] for i, name in enumerate(names)}
        (task_dir / f"fold{fold:02d}.json").write_text(json.dumps(meta))

    problem = _small(
        HearESC50, prepare_data={"task_dir": str(task_dir), "test_fold": 2}
    )
    ws = tmp_path / "ws"
    cfg = problem.default_config()
    cfg.pop("target_dir")
    results = problem.run(str(ws), **cfg)
    logs = results["evaluate_stage"]["test"]
    assert "top1_acc" in logs and "aucroc" in logs
    # fold 2 -> test, fold 3 -> valid, folds {0,1,4} -> train
    import pandas as pd

    assert len(pd.read_csv(ws / "train.csv")) == 9
    assert len(pd.read_csv(ws / "test.csv")) == 3


def test_hear_dcase_timestamp(tmp_path):
    """HEAR timestamp layout: events [{label, start, end} ms] -> onset FMS."""
    from s3prl_tpu.problem import HearDcase2016Task2

    rng = np.random.RandomState(2)
    task_dir = tmp_path / "task"
    for split, n in (("train", 4), ("valid", 2), ("test", 2)):
        names = [f"{split}_{i}.wav" for i in range(n)]
        _write_wavs(task_dir / "audio" / split, names, rng, secs=1.0)
        meta = {
            name: [
                {"label": "beep" if i % 2 == 0 else "clap",
                 "start": 100.0, "end": 380.0}
            ]
            for i, name in enumerate(names)
        }
        (task_dir / f"{split}.json").write_text(json.dumps(meta))

    problem = _small(HearDcase2016Task2, prepare_data={"task_dir": str(task_dir)})
    ws = tmp_path / "ws"
    cfg = problem.default_config()
    cfg.pop("target_dir")
    results = problem.run(str(ws), **cfg)
    logs = results["evaluate_stage"]["test"]
    assert "event_onset_200ms_fms" in logs
    assert np.isfinite(logs["loss"])
    assert json.loads((ws / "classes.json").read_text()) == {"beep": 0, "clap": 1}
