"""Point-cloud geometry helpers (DUSt3R-style ops).

Parity target: reference src/geometry/ptc_geometry.py — `geotrf` (batched
homogeneous transform of point maps), depth <-> pts3d conversions, and
average-distance point-cloud normalization (the loss-side variant lives in
loss/conf_point.py).
"""
from __future__ import annotations

import jax.numpy as jnp


def geotrf(transform: jnp.ndarray, pts: jnp.ndarray, ncol: int | None = None):
    """Apply (..., 4, 4) (or (...,3,4)) transforms to (..., 3) points;
    broadcast over leading dims."""
    R = transform[..., :3, :3]
    t = transform[..., :3, 3]
    out = jnp.einsum("...ij,...j->...i", R, pts) + t
    return out[..., :ncol] if ncol else out


def depth_to_pts3d(depth: jnp.ndarray, intrinsics: jnp.ndarray):
    """(..., H, W) depth + normalized K -> camera-space (..., H, W, 3) points
    (z-depth convention: pts = K^-1 [u, v, 1] * z)."""
    h, w = depth.shape[-2:]
    u = (jnp.arange(w) + 0.5) / w
    v = (jnp.arange(h) + 0.5) / h
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    ones = jnp.ones_like(uu)
    pix = jnp.stack([uu, vv, ones], axis=-1)  # (H, W, 3)
    inv_k = jnp.linalg.inv(intrinsics)
    rays = jnp.einsum("...ij,hwj->...hwi", inv_k, pix)
    return rays * depth[..., None]


def pts3d_to_depth(pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Camera-space points -> z depth."""
    return pts_cam[..., 2]


def normalize_pointcloud(pts: jnp.ndarray, valid=None, eps: float = 1e-8):
    """Scale points so the mean (masked) distance-to-origin is 1; returns
    (normalized pts, scale)."""
    dist = jnp.linalg.norm(pts, axis=-1)
    if valid is None:
        scale = dist.mean()
    else:
        scale = (dist * valid).sum() / jnp.maximum(valid.sum(), 1.0)
    scale = jnp.maximum(scale, eps)
    return pts / scale, scale
