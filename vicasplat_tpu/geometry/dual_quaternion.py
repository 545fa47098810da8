"""Dual-quaternion rigid-motion algebra as a jnp pytree.

A dual quaternion sigma = q_r + eps * q_d encodes a rigid transform; for a
rotation r and translation t: sigma = r + eps/2 * t * r (both quaternions
stored xyzw). Semantics match the reference's DualQuaternion
(reference: src/misc/dq.py:24-271) so that the 8-channel camera head output
decodes to the same 4x4 pose, but everything here is pure-functional jnp
(batched, jit/vmap/grad-safe) instead of an object wrapping pypose tensors.

The 8-vector layout is [q_r(xyzw), q_d(xyzw)] ("dq array",
reference: src/misc/dq.py:106-113).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .quaternion import qconj, qidentity, qmul, qnorm, quat_to_matrix


class DualQuaternion(NamedTuple):
    qr: jnp.ndarray  # (..., 4) xyzw real part
    qd: jnp.ndarray  # (..., 4) xyzw dual part


def from_dq_array(arr: jnp.ndarray, normalize: bool = False) -> DualQuaternion:
    """[..., 8] -> DualQuaternion. Optionally divides both parts by |q_r|."""
    qr, qd = arr[..., :4], arr[..., 4:]
    if normalize:
        n = qnorm(qr)
        qr, qd = qr / n, qd / n
    return DualQuaternion(qr, qd)


def to_dq_array(dq: DualQuaternion) -> jnp.ndarray:
    return jnp.concatenate([dq.qr, dq.qd], axis=-1)


def from_quat_pose(arr: jnp.ndarray) -> DualQuaternion:
    """[..., 7] = [q_r(xyzw), t(xyz)] -> sigma = r + eps/2 * t * r.

    q_r is normalized first (reference: src/misc/dq.py:115-131).
    """
    qr = arr[..., :4]
    qr = qr / qnorm(qr)
    t = arr[..., 4:]
    tq = jnp.concatenate([t, jnp.zeros_like(t[..., :1])], axis=-1)
    qd = qmul(0.5 * tq, qr)
    return DualQuaternion(qr, qd)


def from_translation(t: jnp.ndarray) -> DualQuaternion:
    q = qidentity(t.shape[:-1], t.dtype)
    return from_quat_pose(jnp.concatenate([q, t], axis=-1))


def identity(shape=(), dtype=jnp.float32) -> DualQuaternion:
    return DualQuaternion(qidentity(shape, dtype), jnp.zeros((*shape, 4), dtype))


def dqmul(a: DualQuaternion, b: DualQuaternion) -> DualQuaternion:
    """Dual-quaternion product: (a_r + eps a_d)(b_r + eps b_d)."""
    return DualQuaternion(
        qmul(a.qr, b.qr), qmul(a.qr, b.qd) + qmul(a.qd, b.qr)
    )


def quaternion_conjugate(dq: DualQuaternion) -> DualQuaternion:
    return DualQuaternion(qconj(dq.qr), qconj(dq.qd))


def dual_number_conjugate(dq: DualQuaternion) -> DualQuaternion:
    return DualQuaternion(dq.qr, -dq.qd)


def combined_conjugate(dq: DualQuaternion) -> DualQuaternion:
    return DualQuaternion(qconj(dq.qr), -qconj(dq.qd))


def inverse(dq: DualQuaternion) -> DualQuaternion:
    """Inverse of a *unit* dual quaternion (|q_r| = 1)."""
    qr_inv = qconj(dq.qr)
    return DualQuaternion(qr_inv, -qmul(qmul(qr_inv, dq.qd), qr_inv))


def normalized(dq: DualQuaternion) -> DualQuaternion:
    """Divide both parts by |q_r| (reference: src/misc/dq.py:184-197)."""
    n = qnorm(dq.qr)
    return DualQuaternion(dq.qr / n, dq.qd / n)


def translation(dq: DualQuaternion) -> jnp.ndarray:
    """t = 2 * q_d * q_r^* (vector part). (reference: src/misc/dq.py:224-231)"""
    return qmul(2.0 * dq.qd, qconj(dq.qr))[..., :3]


def homogeneous_matrix(dq: DualQuaternion) -> jnp.ndarray:
    """Unit dual quaternion -> 4x4 homogeneous transform."""
    R = quat_to_matrix(dq.qr)
    t = translation(dq)
    top = jnp.concatenate([R, t[..., None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(m: jnp.ndarray) -> DualQuaternion:
    """4x4 homogeneous transform -> unit dual quaternion."""
    from .quaternion import matrix_to_quat

    q = matrix_to_quat(m[..., :3, :3])
    t = m[..., :3, 3]
    return from_quat_pose(jnp.concatenate([q, t], axis=-1))


def dqpow(dq: DualQuaternion, exponent) -> DualQuaternion:
    """Screw power sigma^e (for ScLERP). Smooth branch via jnp.where.

    Screw parameters (theta, d, axis l, moment m) are extracted from the unit
    dual quaternion; the power rescales theta and d by `exponent`.
    Matches the reference's semantics (reference: src/misc/dq.py:199-222)
    but is branchless so it works under jit/vmap.
    """
    w = jnp.clip(dq.qr[..., 3:4], -1.0, 1.0)
    theta = 2.0 * jnp.arccos(w)
    sin_half = jnp.sin(theta / 2.0)
    small = jnp.abs(sin_half) < 1e-6
    safe_sin = jnp.where(small, 1.0, sin_half)

    s0 = dq.qr[..., :3] / safe_sin
    d = -2.0 * dq.qd[..., 3:4] / safe_sin
    se = (dq.qd[..., :3] - s0 * d / 2.0 * jnp.cos(theta / 2.0)) / safe_sin

    e = exponent
    half = e * theta / 2.0
    qr = jnp.concatenate([jnp.sin(half) * s0, jnp.cos(half)], axis=-1)
    qd = jnp.concatenate(
        [e * d / 2.0 * jnp.cos(half) * s0 + jnp.sin(half) * se,
         -e * d / 2.0 * jnp.sin(half)],
        axis=-1,
    )
    # pure-translation fallback when theta ~ 0
    t = translation(dq)
    fallback = from_translation(e * t)
    return DualQuaternion(
        jnp.where(small, fallback.qr, qr), jnp.where(small, fallback.qd, qd)
    )


def sclerp(start: DualQuaternion, stop: DualQuaternion, t) -> DualQuaternion:
    """Screw linear interpolation: start * (start^-1 stop)^t.

    Shortest-path: flips `start` when the real parts disagree in hemisphere
    (reference: src/misc/dq.py:233-250).
    """
    dot_w = qmul(start.qr, stop.qr)[..., 3:4]
    flip = dot_w < 0
    s = DualQuaternion(
        jnp.where(flip, -start.qr, start.qr), jnp.where(flip, -start.qd, start.qd)
    )
    return dqmul(s, dqpow(dqmul(inverse(s), stop), t))


def transform_point(dq: DualQuaternion, p: jnp.ndarray) -> jnp.ndarray:
    """Apply the rigid motion: p' = R p + t."""
    R = quat_to_matrix(dq.qr)
    return jnp.einsum("...ij,...j->...i", R, p) + translation(dq)
