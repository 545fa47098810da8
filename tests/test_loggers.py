"""Logger selection + offline-wandb run directory (reference src/main.py:66-83
wandb-vs-LocalTensorboard switch; no wandb package or egress here, so the
wandb mode must degrade to the JSONL offline run dir)."""
import json

import numpy as np
import pytest

from vicasplat_tpu.utils.config import RootConfig, WandbConfig
from vicasplat_tpu.utils.loggers import WandbOfflineLogger, make_logger


def _cfg(tmp_path, mode):
    import dataclasses

    return dataclasses.replace(
        RootConfig(), output_dir=str(tmp_path), wandb=WandbConfig(mode=mode)
    )


class TestMakeLogger:
    def test_disabled_prefers_tensorboard(self, tmp_path):
        lg = make_logger(_cfg(tmp_path, "disabled"))
        # tensorboard is present in this env; whatever comes back must not
        # be the wandb path
        assert not isinstance(lg, WandbOfflineLogger)
        if lg is not None:
            lg.add_scalar("train/loss", 1.0, 0)
            lg.close()

    def test_enabled_without_package_falls_back_offline(self, tmp_path):
        try:
            import wandb  # noqa: F401

            pytest.skip("real wandb installed; fallback path not reachable")
        except ImportError:
            pass
        lg = make_logger(_cfg(tmp_path, "offline"))
        assert isinstance(lg, WandbOfflineLogger)
        lg.close()


class TestWandbOffline:
    def test_run_dir_contents(self, tmp_path):
        lg = WandbOfflineLogger(_cfg(tmp_path, "offline"))
        lg.add_scalar("train/loss", 0.5, 10)
        lg.add_scalar("train/loss", 0.25, 20)
        lg.add_scalar("train/psnr", 30.0, 20)
        lg.add_image("val/render", np.zeros((8, 8, 3), np.float32), 20)
        lg.close()

        cfg = json.loads((lg.dir / "config.json").read_text())
        assert cfg["wandb"]["mode"] == "offline"
        lines = [
            json.loads(ln)
            for ln in (lg.dir / "history.jsonl").read_text().splitlines()
        ]
        assert lines[0]["train/loss"] == 0.5 and lines[0]["_step"] == 10
        summary = json.loads((lg.dir / "summary.json").read_text())
        assert summary == {"train/loss": 0.25, "train/psnr": 30.0}
        pngs = list((lg.dir / "media").rglob("*.png"))
        assert len(pngs) == 1 and pngs[0].name == "00000020.png"

    def test_chw_image(self, tmp_path):
        lg = WandbOfflineLogger(_cfg(tmp_path, "offline"))
        lg.add_image("x", np.zeros((3, 4, 5), np.float32), 1,
                     dataformats="CHW")
        lg.close()
        from PIL import Image

        png = next((lg.dir / "media").rglob("*.png"))
        assert Image.open(png).size == (5, 4)  # (W, H)
