"""Atomic-checkpoint semantics (reference discipline: tempfile+atomic move,
s3prl/util/download.py:65-99; step-dir scheme s3prl/problem/base.py:374-421).

A crash mid-write or post-write corruption must never be picked up by
auto-resume: `latest_checkpoint` only returns marker-complete, size-verified
step dirs.
"""

import numpy as np

from s3prl_tpu.train.checkpoint import (
    COMPLETE_MARKER,
    latest_checkpoint,
    load_checkpoint,
    mark_valid_best,
    save_checkpoint,
)


def _params(seed):
    rng = np.random.RandomState(seed)
    return {"w": rng.randn(4, 3).astype(np.float32), "b": rng.randn(3).astype(np.float32)}


def test_save_load_roundtrip(tmp_path):
    p = _params(0)
    save_checkpoint(tmp_path, 10, p, stats={"loss": 1.5})
    ckpt = latest_checkpoint(tmp_path)
    assert ckpt is not None and ckpt.name == "step_10"
    loaded, _, stats = load_checkpoint(ckpt, _params(1))
    np.testing.assert_array_equal(loaded["w"], p["w"])
    assert stats["step"] == 10 and stats["loss"] == 1.5


def test_no_tmp_dir_left_behind(tmp_path):
    save_checkpoint(tmp_path, 1, _params(0))
    assert not list(tmp_path.glob("*.tmp"))
    assert (tmp_path / "step_1" / COMPLETE_MARKER).exists()


def test_truncated_params_falls_back_to_previous_step(tmp_path):
    # the VERDICT r3 #5 scenario: newest params.msgpack corrupted mid-write
    save_checkpoint(tmp_path, 1, _params(0), keep_num_ckpts=None)
    save_checkpoint(tmp_path, 2, _params(1), keep_num_ckpts=None)
    f = tmp_path / "step_2" / "params.msgpack"
    f.write_bytes(f.read_bytes()[: f.stat().st_size // 2])
    ckpt = latest_checkpoint(tmp_path)
    assert ckpt is not None and ckpt.name == "step_1"


def test_interrupted_write_is_invisible(tmp_path):
    save_checkpoint(tmp_path, 1, _params(0), keep_num_ckpts=None)
    # simulate a crash mid-write of step 2: tmp dir exists, no rename yet
    stale = tmp_path / "step_2.tmp"
    stale.mkdir()
    (stale / "params.msgpack").write_bytes(b"partial")
    assert latest_checkpoint(tmp_path).name == "step_1"
    # and the next save of step 2 recovers (clears the stale tmp)
    save_checkpoint(tmp_path, 2, _params(1), keep_num_ckpts=None)
    assert latest_checkpoint(tmp_path).name == "step_2"


def test_missing_marker_is_skipped(tmp_path):
    save_checkpoint(tmp_path, 1, _params(0), keep_num_ckpts=None)
    save_checkpoint(tmp_path, 2, _params(1), keep_num_ckpts=None)
    (tmp_path / "step_2" / COMPLETE_MARKER).unlink()
    assert latest_checkpoint(tmp_path).name == "step_1"


def test_gc_keeps_newest(tmp_path):
    for step in (1, 2, 3):
        save_checkpoint(tmp_path, step, _params(step), keep_num_ckpts=2)
    names = sorted(d.name for d in tmp_path.glob("step_*"))
    assert names == ["step_2", "step_3"]


def test_mark_valid_best_atomic(tmp_path):
    save_checkpoint(tmp_path, 5, _params(0))
    mark_valid_best(tmp_path, 5)
    assert (tmp_path / "valid_best" / "params.msgpack").exists()
    assert not (tmp_path / "valid_best.tmp").exists()
    # re-marking replaces cleanly
    save_checkpoint(tmp_path, 6, _params(1))
    mark_valid_best(tmp_path, 6)
    loaded, _, stats = load_checkpoint(tmp_path / "valid_best", _params(2))
    assert stats["step"] == 6
