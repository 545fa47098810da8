"""Typed configuration system.

Mirrors the reference's Hydra-composition -> dacite-dataclass pipeline
(reference: src/config.py:39-105, config/main.yaml + config/experiment/*)
without Hydra: YAML base + experiment overlay + dotted CLI overrides, then a
recursive dataclass builder. Usage:

    cfg = load_config("configs/main.yaml", experiment="re10k_8view",
                      overrides=["mode=test", "optimizer.lr=1e-4"])
"""
from __future__ import annotations

import copy
import dataclasses
import pathlib
import typing
from typing import Any, Optional

import yaml

from ..decoder.splatting import DecoderSplattingConfig
from ..loss.losses import (
    LossCameraConfig,
    LossDepthConfig,
    LossLpipsConfig,
    LossMseConfig,
)
from ..models.adapter import GaussianAdapterConfig
from ..models.vicanet import VicaNetConfig
from ..models.vicasplat import OpacityMappingConfig, VicaSplatConfig
from ..ops.rasterize import RasterizeConfig
from ..training.optimizer import OptimizerConfig


@dataclasses.dataclass(frozen=True)
class CheckpointingConfig:
    load: Optional[str] = None
    every_n_train_steps: int = 5000
    save_top_k: int = 5
    save_weights_only: bool = True
    output_dir: str = "checkpoints"
    # overlap the checkpoint disk write with training (orbax AsyncCheckpointer)
    async_save: bool = True
    # auto-restore {params, opt_state, step} from the newest checkpoint in
    # output_dir (the reference resumes full Lightning state via
    # trainer.fit(ckpt_path=...), reference main.py:175, config/main.yaml:40-44)
    resume: bool = False


@dataclasses.dataclass(frozen=True)
class TrainSectionConfig:
    distiller: str = ""
    distill_max_steps: int = 0
    distill_only_steps: int = 0
    distill_weight: float = 1.0
    gradient_checkpointing: bool = True
    # remat policy under gradient_checkpointing: "none" = full recompute,
    # "dots" = jax dots_with_no_batch_dims_saveable (matmul outputs survive
    # the scan boundary; backward recomputes only elementwise work)
    remat_policy: str = "none"
    # microbatch the per-step batch this many times inside one jitted step
    # (grad accumulation; Lightning's flag name for familiarity)
    accumulate_grad_batches: int = 1
    lr_cosine_annealing: bool = False
    new_param_keywords: tuple = ("gaussian_param_head", "intrinsic_encoder")
    print_log_every_n_steps: int = 10


@dataclasses.dataclass(frozen=True)
class TestSectionConfig:
    output_path: str = "outputs/eval_results"
    # evaluate the EMA weights from a full-state checkpoint trained with
    # optimizer.ema_decay > 0 (falls back to the raw weights with a warning)
    use_ema: bool = False
    align_pose: bool = True
    pose_align_steps: int = 100
    rot_opt_lr: float = 0.005
    trans_opt_lr: float = 0.005
    compute_scores: bool = True
    save_image: bool = True
    save_video: bool = False
    save_compare: bool = True
    save_gs: bool = False


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    max_steps: int = -1
    val_check_interval: int = 250
    gradient_clip_val: float = 0.5
    num_nodes: int = 1
    precision: str = "bfloat16"
    # jax.profiler trace window (TensorBoard/XProf; the TPU-native analogue
    # of the reference's Benchmarker wall-clock hooks — SURVEY §5 tracing).
    # Traces steps [profile_start, profile_start + profile_steps).
    profile_dir: Optional[str] = None
    profile_start: int = 5
    profile_steps: int = 3


@dataclasses.dataclass(frozen=True)
class LossWeightsConfig:
    mse: Optional[LossMseConfig] = LossMseConfig()
    lpips: Optional[LossLpipsConfig] = None
    camera: Optional[LossCameraConfig] = None
    depth: Optional[LossDepthConfig] = None


@dataclasses.dataclass(frozen=True)
class WandbConfig:
    """Experiment tracking (reference src/main.py:66-83, config/main.yaml
    wandb block): mode 'disabled' selects local TensorBoard, anything else
    selects wandb — the real package when importable, otherwise an offline
    JSONL run directory with the same information (see utils/loggers.py)."""
    mode: str = "disabled"  # disabled | online | offline
    project: str = "vicasplat"
    entity: Optional[str] = None
    name: str = "run"
    tags: tuple = ()


@dataclasses.dataclass(frozen=True)
class RootConfig:
    mode: str = "train"
    encoder: VicaSplatConfig = VicaSplatConfig()
    decoder: DecoderSplattingConfig = DecoderSplattingConfig()
    loss: LossWeightsConfig = LossWeightsConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    checkpointing: CheckpointingConfig = CheckpointingConfig()
    train: TrainSectionConfig = TrainSectionConfig()
    test: TestSectionConfig = TestSectionConfig()
    trainer: TrainerConfig = TrainerConfig()
    dataset: dict = dataclasses.field(default_factory=dict)
    data_loader: dict = dataclasses.field(default_factory=dict)
    seed: int = 250307
    output_dir: str = "outputs"
    wandb: WandbConfig = WandbConfig()


# ---------------------------------------------------------------------------
# recursive dataclass builder (dacite-lite)
# ---------------------------------------------------------------------------

def _build(cls, data):
    if data is None:
        return None
    if dataclasses.is_dataclass(cls):
        if not isinstance(data, dict):
            raise TypeError(f"expected mapping for {cls.__name__}, got {type(data)}")
        kwargs = {}
        fields = {f.name: f for f in dataclasses.fields(cls)}
        for key, value in data.items():
            if key not in fields:
                raise KeyError(f"unknown config key '{key}' for {cls.__name__}")
            kwargs[key] = _build_field(fields[key].type, value)
        return cls(**kwargs)
    return data


def _build_field(tp, value):
    if isinstance(tp, str):  # stringified annotations
        tp = eval(tp, globals())  # noqa: S307 — controlled config types only
    origin = typing.get_origin(tp)
    if origin is typing.Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if value is None:
            return None
        return _build_field(args[0], value)
    if dataclasses.is_dataclass(tp):
        return _build(tp, value)
    if tp is tuple or origin is tuple:
        return tuple(value) if isinstance(value, (list, tuple)) else value
    if tp is dict or origin is dict:
        return dict(value)
    if tp is float:
        # YAML 1.1 parses "4e-5" (no dot/signed exponent) as a string
        return float(value)
    if tp is int and not isinstance(value, bool):
        return int(value)
    return value


def _deep_merge(base: dict, overlay: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in (overlay or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _apply_override(cfg: dict, dotted: str):
    key, _, raw = dotted.partition("=")
    value = yaml.safe_load(raw)
    node = cfg
    parts = key.strip().lstrip("+").split(".")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def load_config(
    main_yaml: str | pathlib.Path,
    experiment: Optional[str] = None,
    overrides: Optional[list[str]] = None,
) -> RootConfig:
    main_yaml = pathlib.Path(main_yaml)
    with open(main_yaml) as f:
        data = yaml.safe_load(f) or {}
    if experiment:
        exp_path = main_yaml.parent / "experiment" / f"{experiment}.yaml"
        with open(exp_path) as f:
            data = _deep_merge(data, yaml.safe_load(f) or {})
    for ov in overrides or []:
        if ov.startswith("+experiment="):
            continue
        _apply_override(data, ov)
    return _build(RootConfig, data)


def parse_cli(argv: list[str]) -> RootConfig:
    """Hydra-style CLI: `python -m vicasplat_tpu.main +experiment=re10k_8view
    mode=test optimizer.lr=1e-4`."""
    experiment = None
    overrides = []
    for a in argv:
        if a.startswith("+experiment="):
            experiment = a.split("=", 1)[1]
        elif "=" in a:
            overrides.append(a)
    root = pathlib.Path(__file__).resolve().parents[2] / "configs" / "main.yaml"
    return load_config(root, experiment=experiment, overrides=overrides)
