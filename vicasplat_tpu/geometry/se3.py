"""SE(3)/SO(3) utilities: exponential maps, pose retraction, camera helpers.

Pure-jnp, batched, branchless (safe under jit/vmap/grad). Semantics follow the
reference's camera utilities (reference: src/misc/cam_utils.py:32-234) but are
vectorized instead of per-sample Python loops.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import dual_quaternion as dqlib
from .quaternion import matrix_to_quat, qnormalize


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrices."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    )
    return rows.reshape(*rows.shape[:-1], 3, 3)


def _rotation_coeffs(theta: jnp.ndarray):
    """Smooth (A, B, C, W, W2) for the SO(3)/SE(3) exponentials.

    Parameterized in angle^2 so gradients are finite at theta = 0 (|theta| is
    not differentiable there; the Taylor branches are polynomials in
    angle^2, which is smooth).
    """
    W = skew(theta)
    W2 = W @ W
    sq = (theta * theta).sum(-1)[..., None, None]
    small = sq < 1e-8
    safe_sq = jnp.where(small, 1.0, sq)
    angle = jnp.sqrt(safe_sq)
    A = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(angle) / angle)
    B = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(angle)) / safe_sq)
    C = jnp.where(
        small, 1.0 / 6.0 - sq / 120.0, (angle - jnp.sin(angle)) / (safe_sq * angle)
    )
    return A, B, C, W, W2


def so3_exp(theta: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula, batched, smooth at the identity."""
    A, B, _, W, W2 = _rotation_coeffs(theta)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), W.shape)
    return eye + A * W + B * W2


def so3_left_jacobian(theta: jnp.ndarray) -> jnp.ndarray:
    """V(theta) such that t = V @ rho in the SE(3) exponential."""
    _, B, C, W, W2 = _rotation_coeffs(theta)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), W.shape)
    return eye + B * W + C * W2


def se3_exp(tau: jnp.ndarray) -> jnp.ndarray:
    """tau = [rho(3), theta(3)] -> 4x4 transform. Batched.

    Same [translation, rotation] ordering as the reference's pose-alignment
    optimizer (reference: src/misc/cam_utils.py:108-121).
    """
    rho, theta = tau[..., :3], tau[..., 3:]
    R = so3_exp(theta)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(theta), rho)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def rigid_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of a rigid 4x4 transform: [R^T, -R^T t]. Batched.

    Exact for SE(3) matrices and far cheaper than the batched-LU path
    jnp.linalg.inv lowers to on TPU.
    """
    R = m[..., :3, :3]
    t = m[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def update_pose(
    cam_trans_delta: jnp.ndarray,
    cam_rot_delta: jnp.ndarray,
    extrinsics: jnp.ndarray,
) -> jnp.ndarray:
    """Left-multiplied SE(3) retraction on the w2c matrix.

    `extrinsics` is c2w; returns updated c2w (reference:
    src/misc/cam_utils.py:123-149). Batched over leading dims.
    """
    tau = jnp.concatenate([cam_trans_delta, cam_rot_delta], axis=-1)
    w2c = rigid_inverse(extrinsics)
    new_w2c = se3_exp(tau) @ w2c
    return rigid_inverse(new_w2c)


def camera_normalization(pivot_pose: jnp.ndarray, poses: jnp.ndarray) -> jnp.ndarray:
    """Express all c2w poses relative to the pivot (first-context) pose.

    (reference: src/misc/cam_utils.py:32-47)
    """
    return jnp.linalg.inv(pivot_pose) @ poses


def camera_matrix_from_dq_array(dq_array: jnp.ndarray, normalize: bool = False):
    dq = dqlib.from_dq_array(dq_array, normalize=normalize)
    return dqlib.homogeneous_matrix(dq)


def camera_matrix_from_qt_array(qt_array: jnp.ndarray):
    return dqlib.homogeneous_matrix(dqlib.from_quat_pose(qt_array))


def camera_dq_array_from_Rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix + translation -> 8-channel dq array (xyzw parts)."""
    q = qnormalize(matrix_to_quat(R), eps=0.0)
    return dqlib.to_dq_array(
        dqlib.from_quat_pose(jnp.concatenate([q, t], axis=-1))
    )


def intrinsics_from_fov(fov: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) [fov_x, fov_y] in radians -> normalized 3x3 K.

    fx = 0.5/tan(fov_x/2), cx = cy = 0.5 (reference:
    src/misc/cam_utils.py:220-234).
    """
    fx = 0.5 / jnp.tan(0.5 * fov[..., 0])
    fy = 0.5 / jnp.tan(0.5 * fov[..., 1])
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    half = 0.5 * one
    K = jnp.stack(
        [fx, zero, half, zero, fy, half, zero, zero, one], axis=-1
    )
    return K.reshape(*K.shape[:-1], 3, 3)


def pose_error_angles(pred: jnp.ndarray, gt: jnp.ndarray):
    """Rotation geodesic error (deg) and translation-direction angle (deg)."""
    R_err = pred[..., :3, :3] @ jnp.swapaxes(gt[..., :3, :3], -1, -2)
    cos = jnp.clip((jnp.trace(R_err, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0)
    rot_deg = jnp.degrees(jnp.arccos(cos))
    tp = pred[..., :3, 3]
    tg = gt[..., :3, 3]
    denom = jnp.linalg.norm(tp, axis=-1) * jnp.linalg.norm(tg, axis=-1)
    cos_t = jnp.clip(
        (tp * tg).sum(-1) / jnp.maximum(denom, 1e-10), -1.0, 1.0
    )
    trans_deg = jnp.degrees(jnp.arccos(cos_t))
    return rot_deg, trans_deg


def get_pnp_pose(pts3d, opacity, intrinsics, h: int, w: int,
                 opacity_threshold: float = 0.3):
    """PnP-RANSAC camera pose from a predicted point map (host-side, OpenCV).

    Parity target: reference src/misc/cam_utils.py:163-183. pts3d (H, W, 3)
    world points per pixel, opacity (H, W) mask source, normalized K.
    Returns a (4, 4) c2w matrix (numpy).
    """
    import cv2
    import numpy as np

    pts3d = np.asarray(pts3d, np.float32)
    opacity = np.asarray(opacity, np.float32)
    K = np.asarray(intrinsics, np.float64).copy()
    K[0, :] *= w
    K[1, :] *= h
    pixels = np.mgrid[:w, :h].T.astype(np.float32)
    mask = opacity > opacity_threshold
    success, rvec, tvec, _ = cv2.solvePnPRansac(
        pts3d[mask], pixels[mask], K, None,
        iterationsCount=100, reprojectionError=5,
        flags=cv2.SOLVEPNP_SQPNP,
    )
    if not success:
        raise RuntimeError("PnP-RANSAC failed")
    R = cv2.Rodrigues(rvec)[0]
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    w2c[:3, 3] = tvec.reshape(3)
    return np.linalg.inv(w2c)
