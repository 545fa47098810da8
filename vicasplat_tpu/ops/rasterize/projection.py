"""Gaussian EWA screen-space projection (pure jnp, fully differentiable).

Stage 1 of the TPU rasterizer: world-space Gaussians -> screen-space splats
(2D means, conic matrices, radii, depths, RGB from SH). Because this stage is
plain XLA, JAX autodiff provides gradients to means/covariances/SH/opacity —
and, via the SE(3) delta applied to the view matrix in render.py, to camera
pose (the `theta`/`rho` gradients the reference gets from its CUDA backward,
reference: src/model/decoder/cuda_splatting.py:233-234).

Semantics follow the classic 3DGS pipeline the reference's renderers
implement: perspective EWA with frustum-clamped Jacobian, +0.3px low-pass
dilation, 3-sigma radius, near-plane cull at z<=0.2.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..sh import eval_sh_colors


class Splats(NamedTuple):
    mean2d: jnp.ndarray   # (N, 2) pixel coords
    conic: jnp.ndarray    # (N, 3) upper-tri of inverse 2D covariance (a, b, c)
    color: jnp.ndarray    # (N, 3)
    alpha: jnp.ndarray    # (N,)
    depth: jnp.ndarray    # (N,) camera-space z
    radius: jnp.ndarray   # (N,) float pixel radius (0 => culled)


def project_gaussians(
    means: jnp.ndarray,        # (N, 3) world
    covariances: jnp.ndarray,  # (N, 3, 3) world
    harmonics: jnp.ndarray,    # (N, 3, d_sh)
    opacities: jnp.ndarray,    # (N,)
    viewmat: jnp.ndarray,      # (4, 4) w2c
    intrinsics: jnp.ndarray,   # (3, 3) normalized K
    image_shape: tuple,        # (H, W)
    sh_degree: int,
    near: float | jnp.ndarray = 0.2,
    eps2d: float = 0.3,
) -> Splats:
    H, W = image_shape
    fx = intrinsics[0, 0] * W
    fy = intrinsics[1, 1] * H
    cx = intrinsics[0, 2] * W
    cy = intrinsics[1, 2] * H

    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    p_cam = means @ R.T + t  # (N, 3)
    z = p_cam[..., 2]
    valid = z > jnp.maximum(near, 0.01)
    z_safe = jnp.where(valid, z, 1.0)

    # EWA Jacobian with frustum clamping (limits 1.3 * tan(fov/2))
    tan_fovx = 0.5 * W / fx
    tan_fovy = 0.5 * H / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = jnp.clip(p_cam[..., 0] / z_safe, -lim_x, lim_x) * z_safe
    ty = jnp.clip(p_cam[..., 1] / z_safe, -lim_y, lim_y) * z_safe

    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    # J = [[fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2]]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # cov_cam = R Sigma R^T; cov2d = J cov_cam J^T + eps2d * I
    cov_cam = jnp.einsum("ij,njk,lk->nil", R, covariances, R)
    # rows of J applied from both sides (only 3 unique entries)
    c00, c01, c02 = cov_cam[:, 0, 0], cov_cam[:, 0, 1], cov_cam[:, 0, 2]
    c11, c12, c22 = cov_cam[:, 1, 1], cov_cam[:, 1, 2], cov_cam[:, 2, 2]
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22) + eps2d
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22) + eps2d

    det = a * c - b * b
    det_valid = det > 1e-12
    det_safe = jnp.where(det_valid, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # 3-sigma radius from the larger eigenvalue
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    mean2d = jnp.stack(
        [fx * p_cam[..., 0] * inv_z + cx, fy * p_cam[..., 1] * inv_z + cy],
        axis=-1,
    )

    # off-screen cull
    on_screen = (
        (mean2d[..., 0] + radius > 0)
        & (mean2d[..., 0] - radius < W)
        & (mean2d[..., 1] + radius > 0)
        & (mean2d[..., 1] - radius < H)
    )
    keep = valid & det_valid & on_screen
    radius = jnp.where(keep, radius, 0.0)

    # view-dependent color
    campos = -R.T @ t  # camera origin in world
    dirs = means - campos
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    color = eval_sh_colors(harmonics, dirs, sh_degree)

    return Splats(
        mean2d=mean2d,
        conic=conic,
        color=color,
        alpha=jnp.where(keep, opacities, 0.0),
        depth=z,
        radius=radius,
    )
