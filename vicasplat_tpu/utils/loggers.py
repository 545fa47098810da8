"""Experiment loggers: wandb (real or offline fallback) + TensorBoard.

Parity target: reference src/main.py:66-83 — `wandb.mode != "disabled"`
selects a WandbLogger (project/name/tags/config, log_code), otherwise a
LocalTensorboardLogger. This environment has no egress and no wandb
package, so the wandb path degrades gracefully:

  1. `import wandb` works      -> real wandb run (online/offline per mode)
  2. no wandb package          -> WandbOfflineLogger: a plain-files run
     directory (config.yaml, history.jsonl, summary.json, media/) holding
     the same information; replayable into a real wandb server later with
     ~5 lines (see WandbOfflineLogger docstring).

All loggers expose the torch SummaryWriter surface used by main.py
(`add_scalar`, `add_image`, `close`) so callers never branch.
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
import time


def make_logger(cfg):
    """cfg: RootConfig. Returns a logger or None (nothing available)."""
    wb = getattr(cfg, "wandb", None)
    if wb is not None and wb.mode != "disabled":
        try:
            import wandb  # noqa: F401

            return WandbLogger(cfg)
        except ImportError:
            print(
                "wandb package not available - falling back to the offline "
                f"JSONL run dir under {cfg.output_dir}/wandb_offline "
                "(same scalars/config/media; see utils/loggers.py to replay "
                "it into a wandb server)"
            )
            return WandbOfflineLogger(cfg)
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(log_dir=f"{cfg.output_dir}/tb")
    except Exception:
        return None


def _config_dict(cfg):
    try:
        return dataclasses.asdict(cfg)
    except Exception:
        return {"repr": repr(cfg)}


class WandbLogger:
    """Real-wandb adapter (requires the wandb package).

    Mirrors the reference's init (src/main.py:68-80): project, entity,
    name, tags, full config; `log_code` on the package source like the
    reference's `wandb.run.log_code("src")`.
    """

    def __init__(self, cfg):
        import wandb

        self._wandb = wandb
        self.run = wandb.init(
            project=cfg.wandb.project,
            entity=cfg.wandb.entity,
            name=f"{cfg.wandb.name} ({cfg.output_dir})",
            tags=list(cfg.wandb.tags) or None,
            mode=cfg.wandb.mode,
            dir=cfg.output_dir,
            config=_config_dict(cfg),
        )
        if self.run is not None:
            code_root = pathlib.Path(__file__).resolve().parents[1]
            try:
                self.run.log_code(str(code_root))
            except Exception:
                pass

    def add_scalar(self, tag, value, step):
        self._wandb.log({tag: float(value)}, step=int(step))

    def add_image(self, tag, img, step, dataformats="HWC"):
        import numpy as np

        arr = np.asarray(img)
        if dataformats == "CHW":
            arr = arr.transpose(1, 2, 0)
        self._wandb.log({tag: self._wandb.Image(arr)}, step=int(step))

    def close(self):
        if self.run is not None:
            self.run.finish()


class WandbOfflineLogger:
    """wandb-shaped run directory without the wandb package.

    Layout (one run per process):
        <output_dir>/wandb_offline/run-<utc>/
            config.json       # full RootConfig
            history.jsonl     # one {"_step": n, "_timestamp": t, tag: v} per log
            summary.json      # last value of every tag (rewritten on close)
            media/<tag>/<step>.png

    Replay into a real wandb server once egress/wandb exist:

        import json, wandb
        run = wandb.init(project=..., config=json.load(open("config.json")))
        for line in open("history.jsonl"):
            d = json.loads(line); run.log(d, step=d.pop("_step"))
    """

    def __init__(self, cfg):
        stamp = time.strftime("%Y%m%d_%H%M%S", time.gmtime())
        self.dir = pathlib.Path(cfg.output_dir) / "wandb_offline" / f"run-{stamp}"
        self.dir.mkdir(parents=True, exist_ok=True)
        (self.dir / "config.json").write_text(
            json.dumps(_config_dict(cfg), indent=2, default=str)
        )
        self._history = open(self.dir / "history.jsonl", "a")
        self._summary = {}

    def add_scalar(self, tag, value, step):
        rec = {"_step": int(step), "_timestamp": time.time(), tag: float(value)}
        self._history.write(json.dumps(rec) + "\n")
        self._history.flush()
        self._summary[tag] = float(value)

    def add_image(self, tag, img, step, dataformats="HWC"):
        import numpy as np
        from PIL import Image

        arr = np.asarray(img)
        if dataformats == "CHW":
            arr = arr.transpose(1, 2, 0)
        if arr.dtype != np.uint8:
            arr = (arr.clip(0.0, 1.0) * 255).astype(np.uint8)
        d = self.dir / "media" / tag.replace("/", "_")
        d.mkdir(parents=True, exist_ok=True)
        Image.fromarray(arr).save(d / f"{int(step):08d}.png")
        self._history.write(json.dumps({
            "_step": int(step), "_timestamp": time.time(),
            tag: {"_type": "image-file",
                  "path": str(d / f'{int(step):08d}.png')},
        }) + "\n")
        self._history.flush()

    def close(self):
        (self.dir / "summary.json").write_text(
            json.dumps(self._summary, indent=2)
        )
        self._history.close()
