"""End-to-end CLI training smoke: `main.train` on a synthetic dataset must
step, checkpoint (full state), emit validation visuals, and resume.

Covers the reference's train-loop surface (main.py + ModelWrapper validation
visuals model_wrapper.py:523-681 + Lightning resume main.py:175).
"""
import dataclasses
import pathlib

import pytest

from tests.test_data import make_chunk
from vicasplat_tpu.main import train
from vicasplat_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_ds")
    make_chunk(root, n_scenes=2, n_views=12, hw=(64, 64))
    return root


def _cfg(synth_root, out_dir, extra=()):
    return load_config(
        "configs/main.yaml",
        experiment="_tiny_smoke",
        overrides=[
            f"dataset.re10k.roots=[{synth_root}]",
            f"checkpointing.output_dir={out_dir}/ckpts",
            f"output_dir={out_dir}",
            "trainer.max_steps=5",
            "trainer.val_check_interval=4",
            "checkpointing.every_n_train_steps=3",
            "checkpointing.save_weights_only=false",
            *extra,
        ],
    )


def test_train_checkpoints_and_visuals(synth_root, tmp_path):
    cfg = _cfg(synth_root, tmp_path)
    train(cfg)

    ckpts = sorted((tmp_path / "ckpts").glob("step_*"))
    assert ckpts, "no checkpoints written"

    val_dirs = sorted((tmp_path / "val").glob("step_*"))
    assert val_dirs, "no validation output dirs"
    files = {p.name for p in val_dirs[0].iterdir()}
    assert "comparison.png" in files
    assert "projections.png" in files
    assert "cameras.png" in files
    assert "interpolation.mp4" in files

    # resume: run again with resume=true; it restores from step 5 and, with
    # max_steps=5 already reached, immediately re-saves the final checkpoint
    cfg2 = _cfg(synth_root, tmp_path, extra=["checkpointing.resume=true"])
    train(cfg2)
    assert sorted((tmp_path / "ckpts").glob("step_*"))


def test_train_profiler_trace(synth_root, tmp_path):
    """trainer.profile_dir captures a jax.profiler trace window (SURVEY §5
    tracing equivalent)."""
    cfg = _cfg(synth_root, tmp_path, extra=[
        f"trainer.profile_dir={tmp_path}/trace",
        "trainer.profile_start=1",
        "trainer.profile_steps=2",
    ])
    train(cfg)
    traces = list((tmp_path / "trace").rglob("*.trace.json.gz"))
    traces += list((tmp_path / "trace").rglob("*.xplane.pb"))
    assert traces, "no profiler trace written"
