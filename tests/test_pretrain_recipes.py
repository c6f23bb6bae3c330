"""End-to-end pseudo-data runs for the SSL pretraining recipes that landed
in round 2 (vq_apc, npc, spec_augment, distiller) — completing the
reference's 8-recipe pretrain zoo (s3prl/pretrain/)."""

import json

import numpy as np
import pytest


def _tiny_audio(problem_cls, overrides):
    from s3prl_tpu.problem.pretrain import PretrainExample

    class Tiny(problem_cls):
        prepare_data = PretrainExample.prepare_data

        def default_config(self):
            cfg = super().default_config()
            cfg["prepare_data"] = {"num_train": 6, "num_valid": 3}
            cfg["build_batch_sampler"] = {"batch_size": 3}
            cfg["train"] = {"total_steps": 4, "log_step": 2, "eval_step": 2, "save_step": 2}
            for k, v in overrides.items():
                cfg[k] = v
            return cfg

    return Tiny()


def _run_and_check(problem, tmp_path):
    config = problem.default_config()
    config.pop("target_dir")
    problem.run(str(tmp_path), **config)
    lines = (tmp_path / "train" / "metrics.jsonl").read_text().splitlines()
    records = [json.loads(l) for l in lines]
    assert any(r["mode"] == "train" for r in records)
    assert all(np.isfinite(r["loss"]) for r in records)
    assert list((tmp_path / "train").glob("step_*"))


def test_pretrain_vq_apc_full_run(tmp_path):
    from s3prl_tpu.problem import PretrainVqApc

    problem = _tiny_audio(
        PretrainVqApc,
        {"build_model": {"input_size": 80, "hidden_size": 32, "num_layers": 2,
                         "vq_codebook_size": (16,), "vq_code_dim": (32,)}},
    )
    _run_and_check(problem, tmp_path)


def test_pretrain_npc_full_run(tmp_path):
    from s3prl_tpu.problem import PretrainNPC

    problem = _tiny_audio(
        PretrainNPC,
        {"build_model": {"input_size": 80, "hidden_size": 32, "n_blocks": 2,
                         "kernel_size": 15, "mask_size": 5}},
    )
    _run_and_check(problem, tmp_path)


def test_pretrain_spec_augment_full_run(tmp_path):
    from s3prl_tpu.problem import PretrainSpecAugment

    problem = _tiny_audio(
        PretrainSpecAugment,
        {"build_model": {"hidden_size": 32, "num_hidden_layers": 2,
                         "num_attention_heads": 4, "intermediate_size": 64},
         "build_task": {"loss": "L1", "time_mask_width": 20, "freq_mask_width": 10}},
    )
    _run_and_check(problem, tmp_path)


def test_pretrain_distiller_full_run(tmp_path):
    from s3prl_tpu.problem import PretrainDistiller

    problem = _tiny_audio(
        PretrainDistiller,
        {
            # the teacher must be a wav-domain upstream; a random-init full
            # hubert (~95M) is too slow for CI, the 2-layer distilhubert
            # entry exercises the same path
            "teacher": {"name": "distilhubert"},
            "build_model": {
                "encoder_layers": 1, "encoder_embed_dim": 768,
                "encoder_ffn_embed_dim": 256, "encoder_attention_heads": 4,
                "final_dim": 768, "n_tasks": 2,
            },
            "build_task": {"pred_layer_id": [1, 2], "cosine_loss": 1.0},
        },
    )
    _run_and_check(problem, tmp_path)
