"""TPU-native k-means (ops/kmeans.py) + the self-contained HuBERT unit
pipeline (PretrainHubert.prepare_units) — replaces the fairseq offline
dump-MFCC -> sklearn -> dump-label flow."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from s3prl_tpu.ops.kmeans import kmeans_assign, kmeans_fit, kmeans_inertia


def test_kmeans_recovers_separated_blobs():
    rng = np.random.RandomState(0)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]], np.float32)
    labels = rng.randint(0, 3, size=600)
    feats = jnp.asarray(centers[labels] + rng.randn(600, 2).astype(np.float32) * 0.3)

    cents = kmeans_fit(jax.random.key(1), feats, 3, iters=15)
    assign = np.asarray(kmeans_assign(feats, cents))
    # every true blob maps to exactly one discovered cluster
    for b in range(3):
        vals, counts = np.unique(assign[labels == b], return_counts=True)
        assert counts.max() / counts.sum() > 0.99, (b, vals, counts)
    assert kmeans_inertia(feats, cents) < 1.0


def test_kmeans_empty_cluster_keeps_centroid():
    # 4 clusters requested for 2 tight blobs: surplus centroids must not NaN
    rng = np.random.RandomState(1)
    feats = jnp.asarray(
        np.concatenate([rng.randn(50, 4), rng.randn(50, 4) + 20.0]).astype(np.float32)
    )
    cents = kmeans_fit(jax.random.key(0), feats, 4, iters=10)
    assert np.isfinite(np.asarray(cents)).all()
    assert kmeans_inertia(feats, cents) < 10.0


def test_hubert_prepare_units_discovers_tone_units(tmp_path):
    """End-to-end unit discovery: tone audio -> MFCC -> k-means -> per-utt
    labels; discovered units must separate the two tone classes (purity),
    and the full recipe (prepare -> units -> 2 train steps) runs."""
    import pandas as pd

    from s3prl_tpu.problem.pretrain import PretrainHubertExample
    from s3prl_tpu.util.pseudo_data import _write_wav

    class ToneHubert(PretrainHubertExample):
        def default_config(self):
            cfg = super().default_config()
            cfg["prepare_units"] = {"num_clusters": 4, "iters": 10,
                                    "max_fit_frames": 20000}
            return cfg

        def prepare_data(self, workspace, config):
            rng = np.random.RandomState(0)
            (workspace / "wavs").mkdir(parents=True, exist_ok=True)
            for split, n in [("train", 6), ("valid", 2)]:
                rows = []
                for i in range(n):
                    f0 = 300.0 if i % 2 == 0 else 1200.0
                    t = np.arange(int(16000 * 0.8)) / 16000.0
                    wav = (0.3 * np.sin(2 * np.pi * f0 * t)
                           + rng.randn(len(t)) * 0.02).astype(np.float32)
                    p = workspace / "wavs" / f"{split}_{i}.wav"
                    _write_wav(p, wav)
                    rows.append(dict(id=f"{split}_{i}", wav_path=str(p),
                                     duration=0.8))
                pd.DataFrame(rows).to_csv(workspace / f"{split}.csv", index=False)

    problem = ToneHubert()
    config = problem.default_config()
    config.pop("target_dir")
    config.pop("prepare_data", None)
    results = problem.run(str(tmp_path), **config)

    df = pd.read_csv(tmp_path / "train.csv")
    assert "units_path" in df.columns
    assert (tmp_path / "units" / "centroids.npy").exists()
    # with 4 clusters over 2 tones, k-means may split each tone across
    # several clusters — the discovery criterion is that the two tones'
    # cluster usage barely overlaps
    lo = np.concatenate([np.load(df.iloc[i]["units_path"]) for i in (0, 2, 4)])
    hi = np.concatenate([np.load(df.iloc[i]["units_path"]) for i in (1, 3, 5)])
    lo_counts = np.bincount(lo, minlength=4) / len(lo)
    hi_counts = np.bincount(hi, minlength=4) / len(hi)
    overlap = np.minimum(lo_counts, hi_counts).sum()
    assert overlap < 0.2, (lo_counts, hi_counts)

    lines = (tmp_path / "train" / "metrics.jsonl").read_text().splitlines()
    assert all(np.isfinite(json.loads(l)["loss"]) for l in lines)
