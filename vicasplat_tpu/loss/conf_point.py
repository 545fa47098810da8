"""Regr3D distillation loss: confidence-weighted 3D point regression against
a frozen DUSt3R/MASt3R teacher's pseudo-ground-truth point maps.

Parity target: reference src/loss/loss_conf_point.py:188-252 — per-example
1%-99% distance-quantile masking of teacher points, optional average-distance
pointcloud normalization for >2 views, student-vs-teacher L2 point loss
weighted by student confidence with -alpha*log(conf) regularization, plus an
L1 confidence-matching term.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Regr3DConfig:
    weight: float = 1.0
    alpha: float = 0.2          # log-conf regularizer weight
    quantile_lo: float = 0.01
    quantile_hi: float = 0.99
    normalize_pointcloud: bool = False
    match_confidence: bool = True


def normalize_pointcloud(pts: jnp.ndarray, valid: jnp.ndarray):
    """Scale points so the average (masked) distance-to-origin is 1.
    pts: (B, V, H, W, 3); valid: (B, V, H, W)."""
    dist = jnp.linalg.norm(pts, axis=-1)
    denom = (dist * valid).sum(axis=(1, 2, 3)) / jnp.maximum(
        valid.sum(axis=(1, 2, 3)), 1.0
    )
    scale = jnp.maximum(denom, 1e-8)[:, None, None, None, None]
    return pts / scale, scale[..., 0]


def regr3d_loss(
    pred_pts: jnp.ndarray,      # (B, V, H, W, 3) student points (canonical frame)
    pred_conf: jnp.ndarray,     # (B, V, H, W) student confidence (>=1)
    teacher_pts: jnp.ndarray,   # (B, V, H, W, 3) teacher pseudo-GT
    teacher_conf: jnp.ndarray,  # (B, V, H, W) teacher confidence
    cfg: Regr3DConfig = Regr3DConfig(),
):
    """Returns (loss, logs)."""
    dist = jnp.linalg.norm(teacher_pts, axis=-1)
    flat = dist.reshape(dist.shape[0], -1)
    lo = jnp.quantile(flat, cfg.quantile_lo, axis=-1)[:, None, None, None]
    hi = jnp.quantile(flat, cfg.quantile_hi, axis=-1)[:, None, None, None]
    valid = ((dist >= lo) & (dist <= hi)).astype(jnp.float32)

    if cfg.normalize_pointcloud:
        pred_pts, _ = normalize_pointcloud(pred_pts, valid)
        teacher_pts, _ = normalize_pointcloud(teacher_pts, valid)

    sq = ((pred_pts - teacher_pts) ** 2).sum(-1)
    conf = jnp.maximum(pred_conf, 1.0 + 1e-6)
    weighted = conf * sq - cfg.alpha * jnp.log(conf)
    denom = jnp.maximum(valid.sum(), 1.0)
    point_loss = (weighted * valid).sum() / denom

    logs = {"regr3d_point": point_loss}
    loss = point_loss
    if cfg.match_confidence:
        conf_loss = (jnp.abs(pred_conf - teacher_conf) * valid).sum() / denom
        logs["regr3d_conf"] = conf_loss
        loss = loss + conf_loss
    return cfg.weight * loss, logs
