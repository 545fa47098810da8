"""Camera projection math: rays, pixel grids, FoV, (un)projection.

Pure-jnp ports of the reference's geometry layer semantics
(reference: src/geometry/projection.py). Conventions:
  - intrinsics are *normalized* (pixel coords in [0, 1]), OpenCV-style.
  - extrinsics are c2w 4x4 matrices.
  - pixel centers are at (i + 0.5) / size.
"""
from __future__ import annotations

import jax.numpy as jnp


def homogenize_points(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)


def homogenize_vectors(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)


def transform_rigid(xh: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...j->...i", m, xh)


def transform_cam2world(xh: jnp.ndarray, c2w: jnp.ndarray) -> jnp.ndarray:
    return transform_rigid(xh, c2w)


def transform_world2cam(xh: jnp.ndarray, c2w: jnp.ndarray) -> jnp.ndarray:
    return transform_rigid(xh, jnp.linalg.inv(c2w))


def project_camera_space(
    points: jnp.ndarray, intrinsics: jnp.ndarray, epsilon: float = 1.19e-7
) -> jnp.ndarray:
    z = points[..., -1:]
    points = points / (z + epsilon)
    points = jnp.nan_to_num(points, posinf=1e8, neginf=-1e8)
    points = jnp.einsum("...ij,...j->...i", intrinsics, points)
    return points[..., :-1]


def project(points, extrinsics, intrinsics, epsilon: float = 1.19e-7):
    """World points -> normalized image xy, plus in-front-of-camera flag."""
    xh = homogenize_points(points)
    cam = transform_world2cam(xh, extrinsics)[..., :-1]
    in_front = cam[..., -1] >= 0
    return project_camera_space(cam, intrinsics, epsilon=epsilon), in_front


def unproject(coordinates, z, intrinsics):
    ch = homogenize_points(coordinates)
    dirs = jnp.einsum("...ij,...j->...i", jnp.linalg.inv(intrinsics), ch)
    return dirs * z[..., None]


def get_world_rays(coordinates, extrinsics, intrinsics):
    """Normalized pixel coords -> world-space (origins, unit directions)."""
    directions = unproject(
        coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics
    )
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    directions = transform_cam2world(homogenize_vectors(directions), extrinsics)
    directions = directions[..., :3]
    origins = jnp.broadcast_to(extrinsics[..., :3, 3], directions.shape)
    return origins, directions


def sample_image_grid(shape: tuple[int, int], dtype=jnp.float32):
    """Half-pixel-centered normalized (x, y) coordinates + integer indices.

    Returns (coords (h, w, 2) float xy-order, indices (h, w, 2) int ij-order),
    matching the reference's grid convention
    (reference: src/geometry/projection.py:131-151).
    """
    h, w = shape
    row = jnp.arange(h)
    col = jnp.arange(w)
    ii, jj = jnp.meshgrid(row, col, indexing="ij")
    indices = jnp.stack([ii, jj], axis=-1)
    x = (col.astype(dtype) + 0.5) / w
    y = (row.astype(dtype) + 0.5) / h
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    coords = jnp.stack([xx, yy], axis=-1)
    return coords, indices


def get_fov(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Normalized K -> (..., 2) [fov_x, fov_y] in radians.

    (reference: src/geometry/projection.py:247-261)
    """
    inv = jnp.linalg.inv(intrinsics)
    def _angle(a, b):
        an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        return jnp.arccos(jnp.clip((an * bn).sum(-1), -1.0, 1.0))

    batch = intrinsics.shape[:-2]
    ones = jnp.ones(batch)
    zeros = jnp.zeros(batch)
    left = jnp.einsum("...ij,...j->...i", inv, jnp.stack([zeros, 0.5 * ones, ones], -1))
    right = jnp.einsum("...ij,...j->...i", inv, jnp.stack([ones, 0.5 * ones, ones], -1))
    top = jnp.einsum("...ij,...j->...i", inv, jnp.stack([0.5 * ones, zeros, ones], -1))
    bottom = jnp.einsum("...ij,...j->...i", inv, jnp.stack([0.5 * ones, ones, ones], -1))
    return jnp.stack([_angle(left, right), _angle(top, bottom)], axis=-1)


def get_local_rays(coordinates, intrinsics):
    """Normalized pixel coords -> unit camera-space ray directions
    (reference: src/geometry/projection.py:117-128)."""
    directions = unproject(
        coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics
    )
    return directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
