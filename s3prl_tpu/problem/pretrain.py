"""SSL pretraining problems (the run_pretrain analog).

Behavioral spec from the reference's pretraining runtime
(s3prl/run_pretrain.py + pretrain/runner.py + per-recipe pretrain_expert.py
and config_model.yaml): each recipe trains its SSL objective on raw audio
CSVs — mockingjay/tera/audio_albert = masked acoustic modeling over on-the-
fly mel features; apc/vq_apc = autoregressive prediction; npc = masked-conv
reconstruction.

TPU-first: the reference does feature extraction + masking in DataLoader
worker processes (pretrain/mockingjay/dataset.py:49-86); here the wav goes
to the device and features + MAM masks are computed inside the jitted train
step (ops/audio + ops/mam) — zero CPU feature code, full overlap.
"""

from __future__ import annotations

import logging
from pathlib import Path

import flax.linen as nn
import pandas as pd

from .base import Problem
from ..data.collate import Buckets, pad_collate
from ..data.loader import DataLoader
from ..data.sampler import SortedBucketingSampler
from ..train.trainer import Trainer, TrainerConfig
from ..upstream.registry import load as hub_load

logger = logging.getLogger(__name__)


class _AudioOnlyDataset:
    """CSV rows with wav_path (+duration); random-free (crop via end_sec)."""

    def __init__(self, csv_path, sample_rate=16000, max_secs: float = 15.0):
        self.df = pd.read_csv(csv_path)
        self.sample_rate = sample_rate
        self.max_secs = max_secs

    def __len__(self):
        return len(self.df)

    @property
    def lengths(self):
        if "duration" in self.df.columns:
            return (
                self.df["duration"].clip(upper=self.max_secs) * self.sample_rate
            ).astype(int).tolist()
        from ..data.audio import audio_info

        return [
            min(audio_info(p)["num_frames"], int(self.max_secs * self.sample_rate))
            for p in self.df["wav_path"]
        ]

    def __getitem__(self, i):
        from ..data.audio import load_wav

        row = self.df.iloc[i]
        wav, _ = load_wav(row["wav_path"], self.sample_rate, 0.0, self.max_secs)
        return {"x": wav, "unique_name": str(row["id"])}


class PretrainProblem(Problem):
    """Shared staged procedure: stage 0 audio CSVs, stage 1 train."""

    STAGES = ["prepare_data", "train_stage"]

    #: which front-end upstream feeds the objective ("fbank" 240-d stacked
    #: deltas for mockingjay, "mel" 80-d log-mel for the others)
    feature_upstream = "mel"

    def prepare_data(self, workspace: Path, config: dict):
        raise NotImplementedError

    def build_task(self, config: dict):
        raise NotImplementedError

    def _loader(self, workspace, csv_name, config):
        csv_path = workspace / csv_name
        if not csv_path.exists():
            return None
        ds = _AudioOnlyDataset(csv_path, max_secs=config.get("max_secs", 15.0))
        cfg = config.get("build_batch_sampler", {})
        sampler = SortedBucketingSampler(
            ds.lengths, batch_size=cfg.get("batch_size", 8),
            max_length=cfg.get("max_length", 16000 * 15), shuffle=True,
        )
        buckets = Buckets.linear(config.get("bucket_step", 16000), 16000 * 30)
        return DataLoader(ds, sampler, lambda items: pad_collate(items, buckets))

    def build_feature_upstream(self, config: dict):
        return hub_load(self.feature_upstream)

    def train_stage(self, workspace: Path, config: dict):
        upstream = self.build_feature_upstream(config)
        task = self.build_task(config)
        trainer = Trainer(
            upstream, task, workspace / "train",
            TrainerConfig(
                optimizer=config.get("build_optimizer", {"name": "AdamW", "lr": 2e-4}),
                **config.get("train", {}),
            ),
        )
        train_loader = self._loader(workspace, "train.csv", config)
        valid_loader = self._loader(workspace, "valid.csv", config)
        trainer.train(train_loader, valid_loader)
        return trainer


def _mam_model(enc_cfg, output_dim):
    from ..models.mockingjay import MockingjayEncoder, SpecPredictionHead

    class PretrainModel(nn.Module):
        @nn.compact
        def __call__(self, feats, feat_lens, train=False):
            hs, lens = MockingjayEncoder(enc_cfg, name="encoder")(
                feats, feat_lens, deterministic=not train
            )
            pred = SpecPredictionHead(enc_cfg, output_dim=output_dim, name="head")(hs[-1])
            return pred, lens

    return PretrainModel()


class PretrainMockingjay(PretrainProblem):
    """MAM on fbank80+deltas (reference: pretrain/mockingjay/config_model.yaml)."""

    feature_upstream = "fbank"

    def default_config(self) -> dict:
        return {
            "target_dir": "???",
            "prepare_data": {"librispeech": "???", "train_split": "train-clean-100"},
            "build_model": {
                "hidden_size": 768, "num_hidden_layers": 3,
                "num_attention_heads": 12, "intermediate_size": 3072,
            },
            "build_task": {
                "loss": "L1", "mask_proportion": 0.15,
                "mask_consecutive": 7, "mask_frequency": 0.0,
            },
            "build_batch_sampler": {"batch_size": 8},
            "build_optimizer": {"name": "AdamW", "lr": 2.0e-4},
            "train": {"total_steps": 1000000, "log_step": 100, "eval_step": 10000, "save_step": 10000},
        }

    input_dim = 240

    def build_task(self, config: dict):
        from ..models.mockingjay import MockingjayConfig
        from ..task.reconstruction import MaskedReconstructionTask

        enc_cfg = MockingjayConfig(
            input_dim=self.input_dim, **config.get("build_model", {})
        )
        module = _mam_model(enc_cfg, self.input_dim)
        return MaskedReconstructionTask(module, **config.get("build_task", {}))

    def prepare_data(self, workspace: Path, config: dict):
        from ..data.corpus.librispeech import prepare_librispeech_asr

        prepare_librispeech_asr(workspace, **config.get("prepare_data", {}))


class PretrainTera(PretrainMockingjay):
    """MAM + frequency masking on log-mel (pretrain/tera/config_model.yaml)."""

    feature_upstream = "mel"
    input_dim = 80

    def default_config(self) -> dict:
        cfg = super().default_config()
        cfg["build_task"]["mask_frequency"] = 0.2
        return cfg


class PretrainAudioAlbert(PretrainTera):
    """Weight-shared TERA (pretrain/audio_albert/config_model.yaml)."""

    def build_task(self, config: dict):
        from ..models.mockingjay import MockingjayConfig
        from ..task.reconstruction import MaskedReconstructionTask

        enc_cfg = MockingjayConfig(
            input_dim=self.input_dim, share_layer=True, **config.get("build_model", {})
        )
        module = _mam_model(enc_cfg, self.input_dim)
        return MaskedReconstructionTask(module, **config.get("build_task", {}))


class PretrainAPC(PretrainProblem):
    """Autoregressive predictive coding (reference: pretrain/apc)."""

    feature_upstream = "mel"

    def default_config(self) -> dict:
        return {
            "target_dir": "???",
            "prepare_data": {"librispeech": "???", "train_split": "train-clean-100"},
            "build_model": {"input_size": 80, "hidden_size": 512, "num_layers": 3},
            "build_task": {"n_future": 5, "loss": "L1"},
            "build_batch_sampler": {"batch_size": 32},
            "build_optimizer": {"name": "Adam", "lr": 1.0e-3},
            "train": {"total_steps": 100000, "log_step": 100, "eval_step": 10000, "save_step": 10000},
        }

    def build_task(self, config: dict):
        from ..models.apc import APCConfig, APCModel
        from ..task.reconstruction import AutoregressiveReconstructionTask

        cfg = APCConfig(**config.get("build_model", {}))

        class Wrapper(nn.Module):
            @nn.compact
            def __call__(self, feats, feat_lens, train=False):
                hs, pred, lens = APCModel(cfg, name="apc")(feats, feat_lens, train=train)
                return pred, lens

        return AutoregressiveReconstructionTask(Wrapper(), **config.get("build_task", {}))

    def prepare_data(self, workspace: Path, config: dict):
        from ..data.corpus.librispeech import prepare_librispeech_asr

        prepare_librispeech_asr(workspace, **config.get("prepare_data", {}))


class PretrainVqApc(PretrainAPC):
    """VQ-APC: APC with gumbel-softmax codebooks between GRU layers
    (reference: pretrain/vq_apc/config_model.yaml)."""

    def default_config(self) -> dict:
        cfg = super().default_config()
        cfg["build_model"].update(
            vq_codebook_size=(512,), vq_code_dim=(512,)
        )
        return cfg

    def build_task(self, config: dict):
        from ..models.apc import APCConfig, APCModel
        from ..task.reconstruction import AutoregressiveReconstructionTask

        mc = dict(config.get("build_model", {}))
        for key in ("vq_codebook_size", "vq_code_dim"):
            if key in mc and not isinstance(mc[key], tuple):
                mc[key] = tuple(mc[key])
        cfg = APCConfig(**mc)

        class Wrapper(nn.Module):
            @nn.compact
            def __call__(self, feats, feat_lens, train=False):
                hs, pred, lens = APCModel(cfg, name="apc")(feats, feat_lens, train=train)
                return pred, lens

        return AutoregressiveReconstructionTask(Wrapper(), **config.get("build_task", {}))


class PretrainNPC(PretrainProblem):
    """Non-autoregressive predictive coding: reconstruct each frame from a
    masked conv context (reference: pretrain/npc/config_model.yaml)."""

    feature_upstream = "mel"

    def default_config(self) -> dict:
        return {
            "target_dir": "???",
            "prepare_data": {"librispeech": "???", "train_split": "train-clean-100"},
            "build_model": {
                "input_size": 80, "hidden_size": 512, "n_blocks": 4,
                "kernel_size": 15, "mask_size": 5,
            },
            "build_task": {"loss": "L1"},
            "build_batch_sampler": {"batch_size": 32},
            "build_optimizer": {"name": "Adam", "lr": 1.0e-3},
            "train": {"total_steps": 100000, "log_step": 100, "eval_step": 10000, "save_step": 10000},
        }

    def build_task(self, config: dict):
        from ..models.npc import NPCConfig, NPCModel
        from ..task.reconstruction import NpcReconstructionTask

        cfg = NPCConfig(**config.get("build_model", {}))

        class Wrapper(nn.Module):
            @nn.compact
            def __call__(self, feats, feat_lens, train=False):
                hs, pred, lens = NPCModel(cfg, name="npc")(feats, feat_lens, train=train)
                return pred, lens

        return NpcReconstructionTask(Wrapper(), **config.get("build_task", {}))

    def prepare_data(self, workspace: Path, config: dict):
        from ..data.corpus.librispeech import prepare_librispeech_asr

        prepare_librispeech_asr(workspace, **config.get("prepare_data", {}))


class PretrainSpecAugment(PretrainProblem):
    """SpecAugment-corruption pretraining: reconstruct LD-policy-masked
    cells (reference: pretrain/spec_augment/pretrain_expert.py + task.py)."""

    feature_upstream = "fbank"
    input_dim = 240

    def default_config(self) -> dict:
        return {
            "target_dir": "???",
            "prepare_data": {"librispeech": "???", "train_split": "train-clean-100"},
            "build_model": {
                "hidden_size": 768, "num_hidden_layers": 3,
                "num_attention_heads": 12, "intermediate_size": 3072,
            },
            "build_task": {
                "loss": "L1", "freq_mask_width": 27, "freq_mask_num": 2,
                "time_mask_width": 100, "time_mask_num": 2,
            },
            "build_batch_sampler": {"batch_size": 8},
            "build_optimizer": {"name": "AdamW", "lr": 2.0e-4},
            "train": {"total_steps": 1000000, "log_step": 100, "eval_step": 10000, "save_step": 10000},
        }

    def build_task(self, config: dict):
        from ..models.mockingjay import MockingjayConfig
        from ..task.reconstruction import SpecAugReconstructionTask

        enc_cfg = MockingjayConfig(
            input_dim=self.input_dim, **config.get("build_model", {})
        )
        module = _mam_model(enc_cfg, self.input_dim)
        return SpecAugReconstructionTask(module, **config.get("build_task", {}))

    def prepare_data(self, workspace: Path, config: dict):
        from ..data.corpus.librispeech import prepare_librispeech_asr

        prepare_librispeech_asr(workspace, **config.get("prepare_data", {}))


class PretrainDistiller(PretrainProblem):
    """DistilHuBERT: distill a frozen teacher's layers into a 2-layer
    student (reference: pretrain/distiller/config_model.yaml). The teacher
    rides as the Trainer's frozen upstream."""

    def default_config(self) -> dict:
        return {
            "target_dir": "???",
            "prepare_data": {"librispeech": "???", "train_split": "train-clean-100"},
            "teacher": {"name": "hubert", "ckpt": None},
            "build_model": {
                "encoder_layers": 2, "encoder_embed_dim": 768,
                "encoder_ffn_embed_dim": 3072, "encoder_attention_heads": 12,
                "final_dim": 768, "n_tasks": 3,
            },
            "build_task": {
                "pred_layer_id": [4, 8, 12], "loss_type": "l1", "cosine_loss": 1.0,
            },
            "build_batch_sampler": {"batch_size": 12},
            "build_optimizer": {"name": "AdamW", "lr": 2.0e-4},
            "train": {"total_steps": 200000, "log_step": 100, "eval_step": 10000, "save_step": 10000},
        }

    def build_feature_upstream(self, config: dict):
        teacher = config.get("teacher", {"name": "hubert"})
        return hub_load(teacher.get("name", "hubert"), ckpt=teacher.get("ckpt"))

    def build_task(self, config: dict):
        from ..models.distiller import DistillerConfig, DistillerModel
        from ..task.distiller_pretrain import DistillerPretrainTask

        mc = dict(config.get("build_model", {}))
        if "conv_feature_layers" in mc and not isinstance(mc["conv_feature_layers"], tuple):
            mc["conv_feature_layers"] = tuple(tuple(c) for c in mc["conv_feature_layers"])
        cfg = DistillerConfig(**mc)
        module = DistillerModel(cfg)
        tc = dict(config.get("build_task", {}))
        tc.setdefault("pred_layer_id", list(range(1, cfg.n_tasks + 1)))
        return DistillerPretrainTask(module, n_tasks=cfg.n_tasks, **tc)

    def prepare_data(self, workspace: Path, config: dict):
        from ..data.corpus.librispeech import prepare_librispeech_asr

        prepare_librispeech_asr(workspace, **config.get("prepare_data", {}))


class PretrainExample(PretrainTera):
    """Smoke-test pretraining on pseudo audio (integration-test artifact)."""

    def default_config(self) -> dict:
        cfg = super().default_config()
        cfg["prepare_data"] = {"num_train": 8, "num_valid": 4}
        cfg["build_model"] = {
            "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 128,
        }
        cfg["train"] = {"total_steps": 4, "log_step": 2, "eval_step": 2, "save_step": 2}
        cfg["build_batch_sampler"] = {"batch_size": 4}
        return cfg

    def prepare_data(self, workspace: Path, config: dict):
        import numpy as np

        from ..util.pseudo_data import _write_wav

        cfg = config.get("prepare_data", {})
        rng = np.random.RandomState(0)
        wav_dir = workspace / "wavs"
        wav_dir.mkdir(parents=True, exist_ok=True)
        for split, n in [("train", cfg.get("num_train", 8)), ("valid", cfg.get("num_valid", 4))]:
            rows = []
            for i in range(n):
                secs = float(rng.uniform(0.5, 2.0))
                wav = (rng.randn(int(16000 * secs)) * 0.1).astype(np.float32)
                path = wav_dir / f"{split}_{i}.wav"
                _write_wav(path, wav)
                rows.append(dict(id=f"{split}_{i}", wav_path=str(path), duration=secs))
            pd.DataFrame(rows).to_csv(workspace / f"{split}.csv", index=False)


class _HubertUnitDataset:
    """Audio + frame-level k-means unit labels (csv: wav_path, units_path)."""

    def __init__(self, csv_path, sample_rate=16000, max_secs: float = 15.0):
        import numpy as np

        self.df = pd.read_csv(csv_path)
        self.sample_rate = sample_rate
        self.max_secs = max_secs

    def __len__(self):
        return len(self.df)

    @property
    def lengths(self):
        return (
            self.df["duration"].clip(upper=self.max_secs) * self.sample_rate
        ).astype(int).tolist()

    def __getitem__(self, i):
        import numpy as np

        from ..data.audio import load_wav

        row = self.df.iloc[i]
        wav, _ = load_wav(row["wav_path"], self.sample_rate, 0.0, self.max_secs)
        units = np.load(row["units_path"]).astype(np.int32)
        return {"x": wav, "units": units, "unique_name": str(row["id"])}


class PretrainHubert(PretrainProblem):
    """HuBERT masked-unit pretraining (reference: the fairseq recipe the
    converted hubert ckpts come from; loss per hubert_model.py:465-560).

    The full iteration-1 loop is self-contained: `prepare_units` discovers
    the masked-prediction targets with the TPU-native k-means
    (`ops/kmeans.py` — MFCC at 10 ms, subsampled to the trunk's 20 ms rate,
    E/M steps as GEMMs) in place of the fairseq dump-MFCC ->
    sklearn-MiniBatchKMeans -> dump-label offline pipeline. Precomputed
    labels still work: point `prepare_units.units_dir` at <id>.npy files,
    or write `units_path` columns in prepare_data and the stage no-ops.
    Iteration 2 (re-label with a trained trunk's hidden states): dump
    features with task/dump_feature.py and re-run with feature="dir".
    """

    feature_upstream = "wav"

    def default_config(self) -> dict:
        return {
            "target_dir": "???",
            "prepare_data": {"librispeech": "???", "train_split": "train-clean-100"},
            "prepare_units": {"num_clusters": 100, "iters": 20,
                              "max_fit_frames": 1_000_000},
            "build_model": {},
            "build_task": {"mask_prob": 0.8, "mask_length": 10},
            "build_batch_sampler": {"batch_size": 8},
            "build_optimizer": {"name": "AdamW", "lr": 5.0e-4, "scheduler": "linear_schedule"},
            "train": {"total_steps": 400000, "log_step": 100, "eval_step": 10000, "save_step": 10000},
        }

    STAGES = ["prepare_data", "prepare_units", "train_stage"]

    def prepare_data(self, workspace: Path, config: dict):
        from ..data.corpus.librispeech import prepare_librispeech_asr

        prepare_librispeech_asr(workspace, **config.get("prepare_data", {}))

    def prepare_units(self, workspace: Path, config: dict):
        """Discover (or attach) frame-level unit labels for every CSV row."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ..data.audio import load_wav
        from ..models.baseline import baseline_features
        from ..ops.kmeans import kmeans_assign, kmeans_fit, kmeans_inertia

        cfg = dict(config.get("prepare_units", {}))
        csvs = [p for p in (workspace / "train.csv", workspace / "valid.csv")
                if p.exists()]
        dfs = {p: pd.read_csv(p) for p in csvs}
        if all("units_path" in df.columns for df in dfs.values()):
            return  # labels shipped by prepare_data — nothing to discover
        units_dir_cfg = cfg.get("units_dir")
        if units_dir_cfg:  # precomputed fairseq-style label dir
            for p, df in dfs.items():
                df["units_path"] = [
                    str(Path(units_dir_cfg) / f"{i}.npy") for i in df["id"]
                ]
                df.to_csv(p, index=False)
            return

        num_clusters = int(cfg.get("num_clusters", 100))
        iters = int(cfg.get("iters", 20))
        max_fit = int(cfg.get("max_fit_frames", 1_000_000))
        sub = int(cfg.get("frame_subsample", 2))  # 10 ms MFCC -> 20 ms units
        max_secs = float(cfg.get("max_secs", 15.0))
        out_dir = workspace / "units"
        out_dir.mkdir(parents=True, exist_ok=True)

        # 39-d MFCC (13 ceps + delta2), padded to 1 s buckets so the feature
        # program compiles once per bucket. NO per-utterance CMVN: fairseq's
        # dump_mfcc pipeline doesn't apply it either, and it would erase the
        # static spectral identity k-means needs to cluster
        feat_fn = jax.jit(lambda w, l: baseline_features(
            w, l, feat_type="mfcc", num_ceps=13, delta_order=2, cmvn=False))

        def mfcc_of(path):
            wav, _ = load_wav(path, 16000, 0.0, max_secs)
            T = max(len(wav), 400)
            Tp = -(-T // 16000) * 16000
            w = jnp.asarray(np.pad(wav, (0, Tp - len(wav))))[None]
            f, fl = feat_fn(w, jnp.asarray([T]))
            return np.asarray(f[0], np.float32)[: int(fl[0]) : 1][::sub]

        fit_chunks, fit_frames = [], 0
        for _, row in dfs[csvs[0]].iterrows():
            if fit_frames >= max_fit:
                break
            f = mfcc_of(row["wav_path"])
            fit_chunks.append(f)
            fit_frames += len(f)
        sample = np.concatenate(fit_chunks)[:max_fit]
        centroids = kmeans_fit(
            jax.random.key(0), jnp.asarray(sample), num_clusters, iters=iters
        )
        np.save(out_dir / "centroids.npy", np.asarray(centroids))
        logger.info(
            f"k-means fit on {len(sample)} frames: inertia "
            f"{kmeans_inertia(jnp.asarray(sample), centroids):.3f}"
        )
        for p, df in dfs.items():
            paths = []
            for _, row in df.iterrows():
                f = mfcc_of(row["wav_path"])
                units = np.asarray(
                    kmeans_assign(jnp.asarray(f), centroids), np.int32
                )
                upath = out_dir / f"{row['id']}.npy"
                np.save(upath, units)
                paths.append(str(upath))
            df["units_path"] = paths
            df.to_csv(p, index=False)

    def build_task(self, config: dict):
        from ..models.hubert import HUBERT_BASE, HubertForPretrain, HubertPretrainConfig

        model_cfg = dict(config.get("build_model", {}))
        num_classes = model_cfg.pop("num_classes", 504)
        module = HubertForPretrain(
            cfg=HUBERT_BASE, pre_cfg=HubertPretrainConfig(num_classes=num_classes),
            **model_cfg,
        )
        from ..task.hubert_pretrain import HubertPretrainTask

        return HubertPretrainTask(module, **config.get("build_task", {}))

    def _loader(self, workspace, csv_name, config):
        csv_path = workspace / csv_name
        if not csv_path.exists():
            return None
        ds = _HubertUnitDataset(csv_path, max_secs=config.get("max_secs", 15.0))
        cfg = config.get("build_batch_sampler", {})
        from ..data.sampler import SortedBucketingSampler

        sampler = SortedBucketingSampler(
            ds.lengths, batch_size=cfg.get("batch_size", 8),
            max_length=cfg.get("max_length", 16000 * 15), shuffle=True,
        )
        buckets = Buckets.linear(config.get("bucket_step", 16000), 16000 * 30)
        return DataLoader(ds, sampler, lambda items: pad_collate(items, buckets))


class PretrainHubertExample(PretrainHubert):
    """Smoke-test HuBERT pretraining: pseudo audio + random units, tiny trunk."""

    def default_config(self) -> dict:
        cfg = super().default_config()
        cfg["prepare_data"] = {"num_train": 6, "num_valid": 2}
        cfg["build_model"] = {"num_classes": 16}
        cfg["build_batch_sampler"] = {"batch_size": 2}
        cfg["train"] = {"total_steps": 2, "log_step": 1, "eval_step": 10**9, "save_step": 2}
        return cfg

    def build_task(self, config: dict):
        from ..models.hubert import HubertForPretrain, HubertPretrainConfig
        from ..models.wav2vec2 import Wav2Vec2Config
        from ..task.hubert_pretrain import HubertPretrainTask

        tiny = Wav2Vec2Config(
            conv_feature_layers=((32, 10, 5), (32, 4, 4), (32, 4, 4), (32, 2, 2), (32, 2, 2)),
            encoder_layers=2, encoder_embed_dim=32,
            encoder_ffn_embed_dim=64, encoder_attention_heads=4,
            dropout=0.0, attention_dropout=0.0, dropout_input=0.0,
        )
        module = HubertForPretrain(
            cfg=tiny, pre_cfg=HubertPretrainConfig(num_classes=16, final_dim=16)
        )
        return HubertPretrainTask(module, **config.get("build_task", {}))

    def prepare_data(self, workspace: Path, config: dict):
        import numpy as np

        from ..util.pseudo_data import _write_wav

        cfg = config.get("prepare_data", {})
        rng = np.random.RandomState(0)
        wav_dir = workspace / "wavs"
        unit_dir = workspace / "units"
        wav_dir.mkdir(parents=True, exist_ok=True)
        unit_dir.mkdir(parents=True, exist_ok=True)
        for split, n in [("train", cfg.get("num_train", 6)), ("valid", cfg.get("num_valid", 2))]:
            rows = []
            for i in range(n):
                secs = float(rng.uniform(0.5, 1.5))
                wav = (rng.randn(int(16000 * secs)) * 0.1).astype(np.float32)
                wav_path = wav_dir / f"{split}_{i}.wav"
                _write_wav(wav_path, wav)
                n_feat = len(wav) // 320
                units = rng.randint(0, 16, size=n_feat).astype(np.int32)
                units_path = unit_dir / f"{split}_{i}.npy"
                np.save(units_path, units)
                rows.append(dict(id=f"{split}_{i}", wav_path=str(wav_path),
                                 units_path=str(units_path), duration=secs))
            pd.DataFrame(rows).to_csv(workspace / f"{split}.csv", index=False)


class PretrainData2Vec(PretrainProblem):
    """data2vec audio pretraining (EMA teacher; reference: upstream/data2vec)."""

    feature_upstream = "wav"

    def default_config(self) -> dict:
        return {
            "target_dir": "???",
            "prepare_data": {"librispeech": "???", "train_split": "train-clean-100"},
            "build_model": {},
            "build_task": {
                "average_top_k_layers": 8, "ema_decay": 0.999,
                "mask_prob": 0.65, "mask_length": 10,
            },
            "build_batch_sampler": {"batch_size": 8},
            "build_optimizer": {"name": "Adam", "lr": 5.0e-4, "scheduler": "linear_schedule"},
            "train": {"total_steps": 400000, "log_step": 100, "eval_step": 10000, "save_step": 10000},
        }

    def build_task(self, config: dict):
        from ..models.wav2vec2 import Wav2Vec2Trunk
        from ..task.data2vec_pretrain import Data2VecPretrainTask
        from ..upstream.registry import DATA2VEC_BASE

        model_cfg = config.get("build_model", {})
        cfg = model_cfg.get("cfg", DATA2VEC_BASE)
        module = Wav2Vec2Trunk(cfg)
        return Data2VecPretrainTask(module, **config.get("build_task", {}))

    def prepare_data(self, workspace: Path, config: dict):
        from ..data.corpus.librispeech import prepare_librispeech_asr

        prepare_librispeech_asr(workspace, **config.get("prepare_data", {}))


class PretrainData2VecExample(PretrainData2Vec):
    """Smoke test: tiny trunk, pseudo audio, EMA teacher must move."""

    def default_config(self) -> dict:
        cfg = super().default_config()
        cfg["prepare_data"] = {"num_train": 6, "num_valid": 2}
        cfg["build_task"] = {"average_top_k_layers": 2, "ema_decay": 0.9,
                             "mask_prob": 0.65, "mask_length": 4}
        cfg["build_batch_sampler"] = {"batch_size": 2}
        cfg["train"] = {"total_steps": 2, "log_step": 1, "eval_step": 10**9, "save_step": 2}
        return cfg

    def build_task(self, config: dict):
        from ..models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Trunk
        from ..task.data2vec_pretrain import Data2VecPretrainTask

        tiny = Wav2Vec2Config(
            conv_feature_layers=((32, 10, 5), (32, 4, 4), (32, 4, 4), (32, 2, 2), (32, 2, 2)),
            encoder_layers=2, encoder_embed_dim=32,
            encoder_ffn_embed_dim=64, encoder_attention_heads=4,
            dropout=0.0, attention_dropout=0.0, dropout_input=0.0,
        )
        return Data2VecPretrainTask(Wav2Vec2Trunk(tiny), **config.get("build_task", {}))

    def prepare_data(self, workspace: Path, config: dict):
        PretrainExample.prepare_data(self, workspace, config)
