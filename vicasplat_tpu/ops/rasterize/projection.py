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

TPU layout note: everything is computed on flat (N,) vectors — the camera
rotation entries are scalars, so all matrix products unroll to scalar-coeff
FMAs on full 8x128 vector lanes. Batched (N, 3, 3) einsums would waste ~98%
of each vector register on the 3-wide trailing dim.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..sh import sh_basis_cols


def cov6_from_scale_rot(scales: jnp.ndarray, quats_xyzw: jnp.ndarray,
                        eps: float = 1e-8) -> jnp.ndarray:
    """(N, 3) scales + (N, 4) xyzw quats -> packed (N, 6) upper-tri world
    covariance [s00, s01, s02, s11, s12, s22], fully SoA.

    Sigma = R diag(s^2) R^T computed as scalar FMAs over (N,) vectors —
    materializing an (N, 3, 3) covariance costs ~42x its logical bytes on
    TPU ((...,3,3) minor dims pad into (4,128)/(8,128) tiles; the device
    profile showed ~5.7 ms of cast+copy for the 18 MB tensor,
    tools/jobs/059). R matches geometry.quaternion.quat_to_matrix exactly
    (xyzw, 2/(|q|^2+eps) scaling — the reference's gaussians.py:8-30)."""
    x, y, z, w = (quats_xyzw[:, 0], quats_xyzw[:, 1], quats_xyzw[:, 2],
                  quats_xyzw[:, 3])
    two_s = 2.0 / ((quats_xyzw * quats_xyzw).sum(-1) + eps)
    r00 = 1 - two_s * (y * y + z * z)
    r01 = two_s * (x * y - z * w)
    r02 = two_s * (x * z + y * w)
    r10 = two_s * (x * y + z * w)
    r11 = 1 - two_s * (x * x + z * z)
    r12 = two_s * (y * z - x * w)
    r20 = two_s * (x * z - y * w)
    r21 = two_s * (y * z + x * w)
    r22 = 1 - two_s * (x * x + y * y)
    s0 = scales[:, 0] ** 2
    s1 = scales[:, 1] ** 2
    s2 = scales[:, 2] ** 2
    return jnp.stack(
        [
            r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2,
            r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2,
            r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2,
            r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2,
            r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2,
            r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2,
        ],
        axis=-1,
    )


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
    cov6: jnp.ndarray = None,  # (N, 6) packed upper-tri world covariance
) -> Splats:
    H, W = image_shape
    fx = intrinsics[0, 0] * W
    fy = intrinsics[1, 1] * H
    cx = intrinsics[0, 2] * W
    cy = intrinsics[1, 2] * H

    R = viewmat[:3, :3]
    t = viewmat[:3, 3]

    # ---- SoA: world means as three (N,) vectors ----
    wx, wy, wz = means[:, 0], means[:, 1], means[:, 2]
    px = R[0, 0] * wx + R[0, 1] * wy + R[0, 2] * wz + t[0]
    py = R[1, 0] * wx + R[1, 1] * wy + R[1, 2] * wz + t[1]
    pz = R[2, 0] * wx + R[2, 1] * wy + R[2, 2] * wz + t[2]

    valid = pz > jnp.maximum(near, 0.01)
    z_safe = jnp.where(valid, pz, 1.0)

    tan_fovx = 0.5 * W / fx
    tan_fovy = 0.5 * H / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = jnp.clip(px / z_safe, -lim_x, lim_x) * z_safe
    ty = jnp.clip(py / z_safe, -lim_y, lim_y) * z_safe

    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # ---- world covariance as 6 (N,) components ----
    # (N, 3, 3) arrays tile badly on TPU (3-wide trailing dims pad into
    # (8,128) registers); callers looping over views should extract the
    # packed (N, 6) upper triangle ONCE and pass it as cov6 — the device
    # profile showed ~6 ms of per-call layout copies otherwise
    # (tools/jobs/056).
    if cov6 is not None:
        s00, s01, s02 = cov6[:, 0], cov6[:, 1], cov6[:, 2]
        s11, s12, s22 = cov6[:, 3], cov6[:, 4], cov6[:, 5]
    else:
        s00 = covariances[:, 0, 0]
        s01 = covariances[:, 0, 1]
        s02 = covariances[:, 0, 2]
        s11 = covariances[:, 1, 1]
        s12 = covariances[:, 1, 2]
        s22 = covariances[:, 2, 2]

    def row_sigma(i):
        """(R_i . Sigma) as three (N,) vectors — scalar-coeff FMAs."""
        r0, r1, r2 = R[i, 0], R[i, 1], R[i, 2]
        c0 = r0 * s00 + r1 * s01 + r2 * s02
        c1 = r0 * s01 + r1 * s11 + r2 * s12
        c2 = r0 * s02 + r1 * s12 + r2 * s22
        return c0, c1, c2

    def dot_row(c, i):
        return c[0] * R[i, 0] + c[1] * R[i, 1] + c[2] * R[i, 2]

    row0 = row_sigma(0)
    row1 = row_sigma(1)
    row2 = row_sigma(2)
    c00 = dot_row(row0, 0)
    c01 = dot_row(row0, 1)
    c02 = dot_row(row0, 2)
    c11 = dot_row(row1, 1)
    c12 = dot_row(row1, 2)
    c22 = dot_row(row2, 2)

    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22) + eps2d
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22) + eps2d

    det = a * c - b * b
    det_valid = det > 1e-12
    det_safe = jnp.where(det_valid, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    u = fx * px * inv_z + cx
    v = fy * py * inv_z + cy
    mean2d = jnp.stack([u, v], axis=-1)

    on_screen = (
        (u + radius > 0) & (u - radius < W) & (v + radius > 0) & (v - radius < H)
    )
    keep = valid & det_valid & on_screen
    radius = jnp.where(keep, radius, 0.0)

    # ---- view-dependent color: SoA SH contraction ----
    campos = -R.T @ t
    dx = wx - campos[0]
    dy = wy - campos[1]
    dz = wz - campos[2]
    # overflow guard: the naive dx^2+dy^2+dz^2 overflows f32 at |mean| ~
    # 1e19+ (early random-init training emits such splats via the exp pts3d
    # head), and the resulting inf turns into NaN color that poisons the
    # composite matmul even at weight 0 (0 * NaN = NaN). Clamping the
    # components at 1e17 is exact for every sane scene (real distances are
    # orders of magnitude smaller) and keeps the wild ones finite — they are
    # culled by the frustum/radius masks anyway. CUDA reference culls before
    # any per-splat math; this is our equivalent.
    dx = jnp.clip(dx, -1e17, 1e17)
    dy = jnp.clip(dy, -1e17, 1e17)
    dz = jnp.clip(dz, -1e17, 1e17)
    inv_n = 1.0 / jnp.maximum(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-8)
    dirs = jnp.stack([dx * inv_n, dy * inv_n, dz * inv_n], axis=-1)
    basis = jnp.stack(sh_basis_cols(dirs, sh_degree), axis=-1)  # (N, d)
    d = basis.shape[-1]
    # contraction as d scalar-weighted accumulations per channel.
    # (A transposed-SoA variant — 75 scalar-FMA passes over (N,) vectors
    # with a hoisted (d, 3, N) table — measured 1.5x faster in isolation
    # but regressed the full 12-view render by 4.5 ms; XLA's fusion of the
    # einsum in context beats the hand-SoA form. tools/jobs/053-054.)
    color = jnp.einsum("ncd,nd->nc", harmonics[..., :d], basis)
    color = jnp.maximum(color + 0.5, 0.0)
    # culled splats must carry exactly-zero payloads: their color/conic can
    # be inf/NaN from degenerate geometry, and NaN survives multiplication
    # by zero weight in the compositing matmul
    color = jnp.where(keep[:, None], color, 0.0)
    conic = jnp.where(keep[:, None], conic, 0.0)
    mean2d = jnp.where(keep[:, None], mean2d, 0.0)

    return Splats(
        mean2d=mean2d,
        conic=conic,
        color=color,
        alpha=jnp.where(keep, opacities, 0.0),
        depth=pz,
        radius=radius,
    )
