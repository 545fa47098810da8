"""Committed-snapshot persistence for the segmented pose retrain.

tools/pose_segments.py commits an f16 weights npz per training segment so
a VM wipe (which has twice destroyed multi-hour checkpoints) cannot eat a
completed segment. These tests pin the round-trip semantics the warm-start
path relies on.
"""
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
import pose_segments  # noqa: E402


def _tree(key, scale=1.0):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "block": {"w": jax.random.normal(k1, (8, 16)) * scale,
                  "b": jnp.zeros((16,))},
        "head": [jax.random.normal(k2, (4, 4)) * scale,
                 jax.random.normal(k3, (3,)) * scale],
    }


def test_committed_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(pose_segments, "COMMIT_NPZ",
                        tmp_path / "weights_latest.npz")
    params = _tree(jax.random.PRNGKey(0))
    pose_segments.save_committed(params, total_steps=24000, seg=1)

    template = _tree(jax.random.PRNGKey(7), scale=9.0)  # values must not leak
    restored, total, seg = pose_segments.load_committed(template)
    assert (total, seg) == (24000, 1)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        assert np.asarray(b).dtype == np.asarray(a).dtype  # template dtypes
        # f16 snapshot: ~1e-3 relative error on unit-scale weights
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_committed_template_mismatch_raises(tmp_path, monkeypatch):
    monkeypatch.setattr(pose_segments, "COMMIT_NPZ",
                        tmp_path / "weights_latest.npz")
    pose_segments.save_committed(_tree(jax.random.PRNGKey(0)), 12000, 0)
    bad_template = {"only": jnp.zeros((2, 2))}
    with pytest.raises(ValueError, match="config drift"):
        pose_segments.load_committed(bad_template)


def _write_ckpt(seg_dir, step):
    from vicasplat_tpu.utils.checkpointing import CheckpointManager
    mgr = CheckpointManager(str(seg_dir), keep=5, async_save=False)
    mgr.save(step, {"w": jnp.zeros((2,))})
    mgr.finalize()


def test_newest_ckpt_orders_by_segment_then_step(tmp_path, monkeypatch):
    """Warm-start must come from the HIGHEST segment even when an earlier
    segment holds a numerically larger step (each segment restarts its
    local step count, so (seg, step) is the only sound ordering)."""
    monkeypatch.setattr(pose_segments, "CKPT_ROOT", tmp_path)
    _write_ckpt(tmp_path / "ckpts_v6_seg0", 12000)
    _write_ckpt(tmp_path / "ckpts_v6_seg1", 6000)
    got = pose_segments.newest_ckpt(upto_seg=3)  # segs 2-3 absent: skipped
    assert got is not None and "seg1" in got and "6000" in got


def test_newest_ckpt_empty(tmp_path, monkeypatch):
    monkeypatch.setattr(pose_segments, "CKPT_ROOT", tmp_path)
    assert pose_segments.newest_ckpt(upto_seg=5) is None


def test_committed_segment_guards_requeued_jobs(tmp_path, monkeypatch):
    """A VM wipe deletes the worker's <job>.out markers, so segment jobs
    re-run. committed_segment() is what run_segment uses to skip segments
    whose results are already in git — without it, a requeued segment 0
    would retrain from scratch and clobber the committed later snapshot."""
    monkeypatch.setattr(pose_segments, "COMMIT_NPZ",
                        tmp_path / "weights_latest.npz")
    assert pose_segments.committed_segment() == -1  # no npz yet
    pose_segments.save_committed(
        _tree(jax.random.PRNGKey(0)),
        total_steps=3 * pose_segments.SEG_STEPS, seg=2)
    assert pose_segments.committed_segment() == 2
    # a partially-trained segment (steps short of the boundary) doesn't count
    pose_segments.save_committed(
        _tree(jax.random.PRNGKey(0)),
        total_steps=3 * pose_segments.SEG_STEPS + 1000, seg=3)
    assert pose_segments.committed_segment() == -1
