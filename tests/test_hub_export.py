"""HF-Hub publishing equivalent (train/hub_export.py) — staging contract.

Reference capability: runner.push_to_huggingface_hub
(/root/reference/s3prl/downstream/runner.py:526-594). Upload needs egress +
a token; what is testable offline (and what the reference's own staging
does) is the repo layout: full artifact copy, dev-best checkpoint under the
model.* convention, generated model card.
"""

from pathlib import Path

from s3prl_tpu.train.hub_export import push_to_hub, stage_hub_repo


def _fake_expdir(tmp_path: Path) -> Path:
    exp = tmp_path / "exp"
    best = exp / "train" / "valid_best"
    best.mkdir(parents=True)
    (best / "params.msgpack").write_bytes(b"\x81\xa1x\x01")
    # checkpoint completeness marker: yaml of file -> size (checkpoint.py:26)
    (best / ".complete").write_text("params.msgpack: 4\n")
    (exp / "config.yaml").write_text("build_upstream:\n  name: hubert\n")
    (exp / "result.yaml").write_text("test:\n  accuracy: 0.97\n")
    return exp


def test_stage_hub_repo_layout(tmp_path):
    exp = _fake_expdir(tmp_path)
    root = stage_hub_repo(exp, upstream="hubert", problem="SuperbSID",
                          repo_name="hubert__abc123")
    assert root.name == "hubert__abc123"
    assert (root / "model" / "params.msgpack").exists()  # dev-best copied
    assert (root / "experiment" / "config.yaml").exists()
    assert not (root / "experiment" / "hf_hub").exists()  # no recursion
    card = (root / "README.md").read_text()
    assert "s3prl_tpu" in card and "hubert" in card and "accuracy: 0.97" in card


def test_stage_falls_back_to_latest_step(tmp_path):
    exp = _fake_expdir(tmp_path)
    import shutil

    shutil.move(str(exp / "train" / "valid_best"), str(exp / "train" / "step_8"))
    root = stage_hub_repo(exp, repo_name="r1")
    assert (root / "model" / "params.msgpack").exists()


def test_push_without_token_returns_staged_path(tmp_path, monkeypatch):
    monkeypatch.delenv("HF_TOKEN", raising=False)
    monkeypatch.delenv("HUGGING_FACE_HUB_TOKEN", raising=False)
    exp = _fake_expdir(tmp_path)
    out = push_to_hub(exp, upstream="fbank", problem="SuperbKS")
    assert Path(out).is_dir()  # staged locally, not a URL
    assert (Path(out) / "README.md").exists()


def test_run_downstream_flag_exists():
    from s3prl_tpu.run_downstream import get_args

    args = get_args(["-d", "sid", "-p", "/tmp/x", "--push_to_hf_hub",
                     "--hf_hub_org", "myorg"])
    assert args.push_to_hf_hub and args.hf_hub_org == "myorg"
