"""Convergence breadth: CTC, ASV, and SD mini-convergence runs (VERDICT r2 #7).

tools/convergence_run.py proves the utterance-classification pipeline learns;
this suite proves the three loss families where training-dynamics bugs live:

  ctc   tone-word sequences -> char CTC; CER -> ~0 proves alignment-free
        sequence training works end to end (optax ctc_loss + length rules).
  asv   synthetic speakers (fixed harmonic signatures) -> x-vector +
        AM-softmax; trial EER falls far below chance.
  sd    two-speaker recordings (distinct tone bands, overlapping segments)
        -> PIT-BCE; test DER falls below the all-speech baseline.

Each variant trains the REAL recipe pipeline (fbank upstream, real samplers/
collate/trainer) on class-correlated synthetic audio, and commits
docs/convergence/<variant>/result.yaml.

Run: JAX_PLATFORMS=cpu python tools/convergence_suite.py [ctc|asv|sd|all]
"""

import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3prl_tpu.problem.asr import AsrExample
from s3prl_tpu.problem.asv import AsvExample
from s3prl_tpu.problem.diarization import SdExample
from s3prl_tpu.util.pseudo_data import _write_wav

OUT = Path(__file__).parent.parent / "docs" / "convergence"


def _tone(f0, secs, rng, sr=16000, noise=0.15):
    t = np.arange(int(sr * secs)) / sr
    wav = np.zeros_like(t, np.float32)
    for h, a in ((1, 0.5), (2, 0.25), (3, 0.12)):
        wav += a * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6.28))
    return (wav + rng.randn(len(t)).astype(np.float32) * noise).astype(np.float32)


# ---------------------------------------------------------------------------
class CtcConvergence(AsrExample):
    """Tone-word sequences: word k = a 0.3 s tone at 300*1.3^k Hz; the
    transcript is the letter sequence. CTC must learn segment -> char."""

    # uppercase: CharacterTokenizer normalizes hypotheses to upper (the
    # LibriSpeech convention, data/encoder.py:129); references must match or
    # every letter scores as an error (train loss 2e-5 / train CER 0.58)
    WORDS = "ABCDEF"

    def default_config(self) -> dict:
        cfg = super().default_config()
        # enough training utterances that the LSTM must generalize rather
        # than memorize (200 utts hit train loss 0.0 / test CER 0.74)
        cfg["prepare_data"] = {"num_train": 800, "num_valid": 24, "num_test": 24}
        cfg["build_downstream"] = {"hidden_size": 96, "num_layers": 1, "proj_size": 96}
        cfg["build_batch_sampler"] = {"batch_size": 16, "max_length": 16000 * 20}
        cfg["build_optimizer"] = {"name": "Adam", "lr": 1.0e-3}
        cfg["train"] = {
            "total_steps": int(os.environ.get("CTC_STEPS", 3000)),
            "log_step": 50, "eval_step": 500, "save_step": 1000,
        }
        return cfg

    def prepare_data(self, workspace: Path, config: dict):
        import pandas as pd

        cfg = config.get("prepare_data", {})
        rng = np.random.RandomState(0)
        wav_dir = workspace / "wavs"
        wav_dir.mkdir(parents=True, exist_ok=True)
        for split, n in [("train", cfg["num_train"]), ("valid", cfg["num_valid"]),
                         ("test", cfg["num_test"])]:
            rows = []
            for i in range(n):
                k = int(rng.randint(2, 6))
                words = rng.randint(0, len(self.WORDS), size=k)
                pieces = []
                for w in words:
                    pieces.append(_tone(300.0 * (1.3 ** w), 0.3, rng))
                    pieces.append(np.zeros(int(16000 * 0.06), np.float32))
                wav = np.concatenate(pieces) * 0.3
                path = wav_dir / f"{split}_{i}.wav"
                _write_wav(path, wav)
                text = " ".join(self.WORDS[w] for w in words)
                rows.append(dict(id=f"{split}_{i}", wav_path=str(path),
                                 transcription=text, duration=len(wav) / 16000.0))
            pd.DataFrame(rows).to_csv(workspace / f"{split}.csv", index=False)


# ---------------------------------------------------------------------------
class AsvConvergence(AsvExample):
    """8 synthetic speakers, each a fixed harmonic signature (f0 + spectral
    tilt); x-vector training must separate them -> EER << 50% chance."""

    def default_config(self) -> dict:
        cfg = super().default_config()
        # enough speakers and utterances that the cosine-scoring embedding
        # space organizes (8 spk x 12 utts memorized: unseen utterances all
        # collapsed into one cone; margin 0.4 from step 0 also stalls the
        # short run — acc 0.18 vs 0.53 at 600 steps with margin 0)
        # 40 utts/spk + dropout 0.2: at 20/spk the embedding space overfits
        # train speakers past ~800 steps (EER 0.151@800 -> 0.188@2500);
        # with more data + dropout the 1200-step run reaches EER 0.132
        cfg["prepare_data"] = {"num_speakers": 24, "utts_per_speaker": 40}
        cfg["build_downstream"] = {"output_size": 128, "hidden_size": 256,
                                   "aggregation_size": 512, "dropout_p": 0.2}
        # margin 0: the AM-softmax margin is a real-data regularizer; at this
        # toy scale margin 0.1 stalls optimization (train acc 0.05 vs 0.43 at
        # 800 steps; EER 0.196 vs 0.151) — the convergence criterion tests the
        # pipeline's training dynamics, not the margin. The real recipe keeps
        # the reference's margin 0.4 (task/speaker_verification.py default).
        cfg["build_task"] = {"margin": 0.0}
        cfg["build_batch_sampler"] = {"batch_size": 16}
        cfg["build_optimizer"] = {"name": "AdamW", "lr": 1.0e-3}
        cfg["train"] = {
            "total_steps": int(os.environ.get("ASV_STEPS", 1200)),
            "log_step": 25, "eval_step": 10**9, "save_step": 200,
            "gradient_clipping": 1000.0,
        }
        return cfg

    def prepare_data(self, workspace: Path, config: dict):
        import pandas as pd

        cfg = config.get("prepare_data", {})
        rng = np.random.RandomState(0)
        wav_dir = workspace / "wavs"
        wav_dir.mkdir(parents=True, exist_ok=True)
        n_spk = cfg["num_speakers"]
        n_utt = cfg["utts_per_speaker"]
        spk_f0 = 100.0 * (1.12 ** np.arange(n_spk))
        spk_tilt = rng.uniform(0.3, 1.6, size=n_spk)
        rows_train, rows_test = [], []
        for s in range(n_spk):
            for u in range(n_utt):
                # syllabic: tone bursts with gaps. The fbank upstream applies
                # per-utterance CMVN (mean AND variance, ops/audio.py:336) —
                # a STATIC harmonic spectrum is erased entirely by it (the
                # round-2 generator produced features with same-speaker
                # cosine ~= cross-speaker ~= 0); burst/silence alternation
                # keeps the speaker's harmonic bins swinging consistently
                # so frame-level features stay discriminative post-CMVN.
                pieces = []
                for _ in range(int(rng.randint(4, 8))):
                    dur = float(rng.uniform(0.08, 0.2))
                    t = np.arange(int(16000 * dur)) / 16000.0
                    f = spk_f0[s] * float(rng.uniform(0.97, 1.03))
                    w = np.zeros_like(t, np.float32)
                    for h in range(1, 6):
                        a = 0.5 / (h ** spk_tilt[s])
                        w += a * np.sin(2 * np.pi * f * h * t + rng.uniform(0, 6.28))
                    ramp = np.minimum(
                        np.arange(len(t)), np.arange(len(t))[::-1]) / 160.0
                    w = w * np.minimum(1.0, ramp)
                    pieces.append(w.astype(np.float32))
                    pieces.append(np.zeros(int(16000 * rng.uniform(0.03, 0.1)),
                                           np.float32))
                wav = np.concatenate(pieces)
                wav = wav + rng.randn(len(wav)).astype(np.float32) * 0.15
                path = wav_dir / f"spk{s}_utt{u}.wav"
                _write_wav(path, (wav * 0.3).astype(np.float32))
                row = dict(id=f"spk{s}-utt{u}", wav_path=str(path), label=f"spk{s}")
                (rows_test if u >= n_utt - 4 else rows_train).append(row)
        pd.DataFrame(rows_train).to_csv(workspace / "train.csv", index=False)
        pd.DataFrame(rows_test).to_csv(workspace / "test.csv", index=False)
        trials = []
        test_ids = [r["id"].replace("-", "/") for r in rows_test]
        for i, a in enumerate(test_ids):
            for b in test_ids[i + 1:]:
                trials.append((int(a.split("/")[0] == b.split("/")[0]), a, b))
        pd.DataFrame(trials, columns=["label", "enroll", "test"]).to_csv(
            workspace / "trials.csv", index=False
        )


# ---------------------------------------------------------------------------
class SdConvergence(SdExample):
    """Two speakers with distinct tone bands, overlapping activity; the PIT
    frame classifier must localize both -> DER falls."""

    def default_config(self) -> dict:
        cfg = super().default_config()
        cfg["prepare_data"] = {"num_recordings": 8, "secs": 4.0}
        cfg["build_downstream"] = {"hidden_size": 128, "num_layers": 2}
        cfg["build_batch_sampler"] = {"batch_size": 4}
        cfg["build_optimizer"] = {"name": "Adam", "lr": 1.0e-3}
        cfg["train"] = {
            "total_steps": int(os.environ.get("SD_STEPS", 800)),
            "log_step": 25, "eval_step": 200, "save_step": 200,
        }
        return cfg

    def prepare_data(self, workspace: Path, config: dict):
        cfg = config.get("prepare_data", {})
        rng = np.random.RandomState(0)
        n = cfg.get("num_recordings", 8)
        secs = cfg.get("secs", 4.0)
        sr = 16000
        from s3prl_tpu.data.corpus.kaldi_diar import prepare_diarization

        for split in ["train", "valid", "test"]:
            data_dir = workspace / f"kaldi_{split}"
            data_dir.mkdir(parents=True, exist_ok=True)
            wav_scp, segments, utt2spk = [], [], []
            for r in range(n):
                reco = f"{split}_reco{r}"
                wav = rng.randn(int(sr * secs)).astype(np.float32) * 0.03
                segs = []
                # speaker A: low tones; speaker B: high tones; random
                # alternating segments with some overlap
                cursor = 0.0
                turn = int(rng.randint(2))
                while cursor < secs - 0.5:
                    dur = float(rng.uniform(0.6, 1.2))
                    s, e = cursor, min(cursor + dur, secs)
                    spk = "AB"[turn]
                    f0 = rng.uniform(300, 450) if spk == "A" else rng.uniform(1000, 1300)
                    i0, i1 = int(s * sr), int(e * sr)
                    tone = _tone(f0, e - s, rng, noise=0.0)
                    m = min(len(tone), i1 - i0)
                    wav[i0 : i0 + m] += tone[:m] * 0.3
                    segs.append((spk, s, e))
                    # next turn starts slightly before this one ends (overlap)
                    cursor = e - float(rng.uniform(0.0, 0.2))
                    turn = 1 - turn
                path = workspace / "wavs" / f"{reco}.wav"
                path.parent.mkdir(exist_ok=True)
                _write_wav(path, (wav * 0.5).astype(np.float32))
                wav_scp.append(f"{reco} {path}")
                for u, (spk, s, e) in enumerate(segs):
                    utt = f"{reco}_u{u}"
                    segments.append(f"{utt} {reco} {s:.2f} {e:.2f}")
                    utt2spk.append(f"{utt} {spk}")
            (data_dir / "wav.scp").write_text("\n".join(wav_scp))
            (data_dir / "segments").write_text("\n".join(segments))
            (data_dir / "utt2spk").write_text("\n".join(utt2spk))
        prepare_diarization(
            workspace,
            train_dir=workspace / "kaldi_train",
            valid_dir=workspace / "kaldi_valid",
            test_dir=workspace / "kaldi_test",
        )


# ---------------------------------------------------------------------------
def _run(problem, variant, metric_key, threshold, lower_better=True):
    import shutil
    import tempfile

    import yaml

    out_dir = OUT / variant
    out_dir.mkdir(parents=True, exist_ok=True)
    with tempfile.TemporaryDirectory() as ws:
        config = problem.default_config()
        config.pop("target_dir")
        results = problem.run(ws, **config)
        metrics_path = Path(ws) / "train" / "metrics.jsonl"
        metrics = [json.loads(l) for l in metrics_path.read_text().splitlines()]
        shutil.copy(metrics_path, out_dir / "metrics.jsonl")

    train_losses = [(m["step"], round(m["loss"], 4)) for m in metrics if m["mode"] == "train"]
    test_logs = results["evaluate_stage"]["test"]
    value = float(test_logs[metric_key])
    summary = {
        "variant": variant,
        "protocol": f"{type(problem).__name__} on class-correlated synthetic audio, "
        f"{config['train']['total_steps']} steps, fbank upstream",
        "first_train_loss": train_losses[0][1],
        "final_train_loss": train_losses[-1][1],
        "test": {k: round(float(v), 4) for k, v in test_logs.items()
                 if isinstance(v, (int, float))},
        "criterion": f"{metric_key} {'<' if lower_better else '>'} {threshold}",
        "loss_curve": train_losses[:: max(len(train_losses) // 40, 1)],
    }
    with open(out_dir / "result.yaml", "w") as f:
        yaml.safe_dump(summary, f, sort_keys=False)
    print(json.dumps({k: v for k, v in summary.items() if k != "loss_curve"}, indent=2))
    ok = (value < threshold) if lower_better else (value > threshold)
    assert ok, f"{variant}: {metric_key}={value} failed {summary['criterion']}"
    print(f"{variant.upper()} CONVERGED ({metric_key}={value:.4f})")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("ctc", "all"):
        _run(CtcConvergence(), "ctc", "cer", 0.2)
    if which in ("asv", "all"):
        _run(AsvConvergence(), "asv", "eer", 0.15)
    if which in ("sd", "all"):
        _run(SdConvergence(), "sd", "der", 0.3)


if __name__ == "__main__":
    main()
