"""Camera trajectory generation: pose interpolation, wobble, spin.

Parity targets: reference src/visualization/camera_trajectory/
{interpolation.py, wobble.py} — used for rendered video outputs. Pose
interpolation here rides the dual-quaternion ScLERP (shortest-path, constant
screw velocity) rather than the reference's pivot parameterization; endpoints
and rigidity match.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import dual_quaternion as dq


def interpolate_extrinsics(
    start: jnp.ndarray,  # (4, 4) c2w
    end: jnp.ndarray,    # (4, 4) c2w
    t: jnp.ndarray,      # (S,) in [0, 1]
) -> jnp.ndarray:
    """ScLERP between two poses -> (S, 4, 4)."""
    a = dq.from_matrix(start)
    b = dq.from_matrix(end)
    return jax.vmap(lambda tt: dq.homogeneous_matrix(dq.sclerp(a, b, tt)))(t)


def interpolate_trajectory(poses: jnp.ndarray, steps_per_segment: int = 10):
    """Piecewise ScLERP through a (V, 4, 4) pose sequence."""
    segs = []
    v = poses.shape[0]
    for i in range(v - 1):
        t = jnp.linspace(0.0, 1.0, steps_per_segment, endpoint=False)
        segs.append(interpolate_extrinsics(poses[i], poses[i + 1], t))
    segs.append(poses[-1:])
    return jnp.concatenate(segs, axis=0)


def generate_wobble_transformation(
    radius: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """(S,) phase -> (S, 4, 4) circular in-plane translation offsets
    (reference wobble.py:8-26)."""
    tf = jnp.broadcast_to(jnp.eye(4), (*t.shape, 4, 4))
    radius = jnp.asarray(radius)
    tf = tf.at[..., 0, 3].set(radius * jnp.sin(2 * jnp.pi * t))
    tf = tf.at[..., 1, 3].set(-radius * jnp.cos(2 * jnp.pi * t))
    return tf


def generate_wobble(extrinsics: jnp.ndarray, radius, t) -> jnp.ndarray:
    """Wobble a camera around its pose: (4,4), scalar radius, (S,) -> (S,4,4)."""
    tf = generate_wobble_transformation(radius, t)
    return extrinsics @ tf
