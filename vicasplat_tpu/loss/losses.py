"""Training losses.

Parity targets: reference src/loss/{loss_mse.py, loss_camera.py,
loss_depth.py, loss_lpips.py}. All pure-jnp; LPIPS uses the JAX VGG port in
loss/lpips.py when weights are available (see utils/ckpt_convert.py).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..geometry import dual_quaternion as dqlib
from ..geometry.projection import get_fov
from ..geometry.se3 import camera_dq_array_from_Rt
from ..geometry.quaternion import matrix_to_quat


@dataclasses.dataclass(frozen=True)
class LossMseConfig:
    weight: float = 1.0


@dataclasses.dataclass(frozen=True)
class LossCameraConfig:
    weight: float = 0.1
    use_dq_loss: bool = True
    camera_type: str = "dq"
    # Opt-in auxiliary penalty on the ANGLE between predicted and GT
    # relative-translation directions — the exact quantity pose-AUC scores
    # (evaluation/metrics.translation_angle_deg; reference
    # cam_utils.py:186-198 feeds max(rot, trans) angular error into the
    # AUC). The dq/qt L1 terms above penalize translation *components*,
    # which underweights direction error when |t_gt| is small; measured on
    # the synthetic pose study, held-out rotation converges to ~3 deg while
    # translation direction stalls at ~40 deg (DESIGN.md §8.3). 0 = off.
    trans_dir_weight: float = 0.0


@dataclasses.dataclass(frozen=True)
class LossLpipsConfig:
    weight: float = 0.05
    apply_after_step: int = 0


@dataclasses.dataclass(frozen=True)
class LossDepthConfig:
    weight: float = 0.25


def l1(a, b):
    return jnp.abs(a - b).mean()


def l2(a, b):
    return ((a - b) ** 2).mean()


def mse_loss(pred_color: jnp.ndarray, target_color: jnp.ndarray,
             cfg: LossMseConfig = LossMseConfig()) -> jnp.ndarray:
    return cfg.weight * l2(pred_color, target_color)


def camera_dq_loss(pred_dq_array: jnp.ndarray, gt_dq_array: jnp.ndarray):
    """L1(pred * gt^*, identity) in both orders
    (reference loss_camera.py:30-45)."""
    pred = dqlib.from_dq_array(pred_dq_array)
    gt = dqlib.from_dq_array(gt_dq_array)
    ident = dqlib.to_dq_array(dqlib.identity(pred_dq_array.shape[:-1]))
    a = dqlib.to_dq_array(dqlib.dqmul(pred, dqlib.quaternion_conjugate(gt)))
    b = dqlib.to_dq_array(dqlib.dqmul(gt, dqlib.quaternion_conjugate(pred)))
    return l1(a, ident) + l1(b, ident)


def camera_loss(
    pred_extrins: jnp.ndarray,          # (B, T-1, 8|7) normalized head output
    context_extrinsics: jnp.ndarray,    # (B, T, 4, 4) GT c2w (frame-0-relative)
    pred_intrins: Optional[jnp.ndarray] = None,   # (B, 2) FoV
    context_intrinsics: Optional[jnp.ndarray] = None,  # (B, T, 3, 3)
    cfg: LossCameraConfig = LossCameraConfig(),
) -> jnp.ndarray:
    gt = context_extrinsics[:, 1:]
    if cfg.camera_type == "dq":
        gt_array = camera_dq_array_from_Rt(gt[..., :3, :3], gt[..., :3, 3])
        loss = l1(pred_extrins, gt_array)
        if cfg.use_dq_loss:
            loss = loss + camera_dq_loss(pred_extrins, gt_array)
    else:
        q = matrix_to_quat(gt[..., :3, :3])
        gt_array = jnp.concatenate([q, gt[..., :3, 3]], axis=-1)
        loss = l1(pred_extrins, gt_array)
    if pred_intrins is not None and context_intrinsics is not None:
        gt_fov = get_fov(context_intrinsics.mean(axis=1))
        loss = loss + l2(pred_intrins, gt_fov)
    loss = cfg.weight * loss
    if cfg.trans_dir_weight > 0.0:
        if cfg.camera_type == "dq":
            pred_t = dqlib.translation(
                dqlib.normalized(dqlib.from_dq_array(pred_extrins)))
        else:
            pred_t = pred_extrins[..., 4:7]
        loss = loss + cfg.trans_dir_weight * translation_direction_loss(
            pred_t, gt[..., :3, 3])
    return loss


def translation_direction_loss(pred_t: jnp.ndarray,
                               gt_t: jnp.ndarray) -> jnp.ndarray:
    """Mean (1 - cos angle) between predicted and GT translation directions.

    Pairs whose GT translation is ~0 carry no direction information (the
    metric itself is undefined there) and are masked out. Norms use a
    smoothed sqrt so the gradient stays finite at pred_t = 0.
    """
    pred_t = pred_t.astype(jnp.float32)
    gt_t = gt_t.astype(jnp.float32)
    pn = jnp.sqrt((pred_t ** 2).sum(-1) + 1e-12)
    gn = jnp.sqrt((gt_t ** 2).sum(-1) + 1e-12)
    cos = (pred_t * gt_t).sum(-1) / (pn * gn)
    valid = (gn > 1e-4).astype(cos.dtype)
    return ((1.0 - cos) * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def depth_smoothness_loss(
    depth: jnp.ndarray,   # (B, V, H, W)
    image: jnp.ndarray,   # (B, V, H, W, 3)
    cfg: LossDepthConfig = LossDepthConfig(),
) -> jnp.ndarray:
    """Bilateral (edge-aware) depth gradient penalty
    (reference loss_depth.py:26-60)."""
    d = jnp.log(jnp.clip(depth, 1e-6))
    dx = jnp.abs(d[..., :, 1:] - d[..., :, :-1])
    dy = jnp.abs(d[..., 1:, :] - d[..., :-1, :])
    ix = jnp.abs(image[..., :, 1:, :] - image[..., :, :-1, :]).mean(-1)
    iy = jnp.abs(image[..., 1:, :, :] - image[..., :-1, :, :]).mean(-1)
    return cfg.weight * (
        (dx * jnp.exp(-ix)).mean() + (dy * jnp.exp(-iy)).mean()
    )


def total_loss(
    pred_color: jnp.ndarray,
    target_color: jnp.ndarray,
    pred_extrins: jnp.ndarray,
    context_extrinsics: jnp.ndarray,
    pred_intrins: Optional[jnp.ndarray] = None,
    context_intrinsics: Optional[jnp.ndarray] = None,
    mse_cfg: LossMseConfig = LossMseConfig(),
    cam_cfg: LossCameraConfig = LossCameraConfig(),
    lpips_fn=None,
    lpips_cfg: LossLpipsConfig = LossLpipsConfig(),
) -> tuple[jnp.ndarray, dict]:
    """The flagship (mse + lpips + camera) objective. Returns (loss, logs)."""
    losses = {
        "mse": mse_loss(pred_color, target_color, mse_cfg),
        "camera": camera_loss(
            pred_extrins, context_extrinsics, pred_intrins,
            context_intrinsics, cam_cfg,
        ),
    }
    if lpips_fn is not None:
        losses["lpips"] = lpips_cfg.weight * lpips_fn(pred_color, target_color)
    loss = sum(losses.values())
    return loss, losses
