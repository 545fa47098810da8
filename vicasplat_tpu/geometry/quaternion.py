"""Quaternion algebra on jnp arrays.

Convention: quaternions are stored **xyzw** (imaginary first, real last),
matching the reference framework's convention (reference:
src/model/encoder/common/gaussians.py:8-30 uses xyzw; src/misc/dq.py stores
pypose SO3 tensors which are xyzw).

All functions are batched over leading dims and differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp


def qmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of two xyzw quaternions, batched."""
    ax, ay, az, aw = jnp.moveaxis(a, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def qconj(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate (negate imaginary part)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def qnorm(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(q, axis=-1, keepdims=True)


def qnormalize(q: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    return q / (qnorm(q) + eps)


def qidentity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    q = jnp.zeros((*shape, 4), dtype=dtype)
    return q.at[..., 3].set(1.0)


def qrotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by xyzw quaternions q (..., 4)."""
    qv = jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)
    return qmul(qmul(q, qv), qconj(q))[..., :3]


def quat_to_matrix(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """xyzw quaternion -> 3x3 rotation matrix.

    Matches the reference's covariance-building convention
    (reference: src/model/encoder/common/gaussians.py:8-30): not assumed
    normalized; uses 2/(|q|^2 + eps) scaling.
    """
    i, j, k, r = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / ((q * q).sum(-1) + eps)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(*o.shape[:-1], 3, 3)


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> xyzw unit quaternion (branchless, batched).

    Uses the numerically-stable 4-candidate construction: all four candidate
    quaternions are computed and the one with the largest pivot is selected
    elementwise, so it is jit/vmap-safe.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def _stack(x, y, z, w):
        return jnp.stack([x, y, z, w], axis=-1)

    # candidates proportional to q * 4|q_pivot|
    qw = _stack(m21 - m12, m02 - m20, m10 - m01, 1.0 + tr)
    qx = _stack(1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12)
    qy = _stack(m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21, m02 - m20)
    qz = _stack(m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11, m10 - m01)

    piv = jnp.stack(
        [1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11, 1.0 + tr],
        axis=-1,
    )
    best = jnp.argmax(piv, axis=-1)
    cands = jnp.stack([qx, qy, qz, qw], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[
        ..., 0, :
    ]
    q = qnormalize(q, eps=1e-12)
    # canonicalize sign: w >= 0
    return jnp.where(q[..., 3:4] < 0, -q, q)
