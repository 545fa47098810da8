"""Epipolar ray-overlap utilities.

Parity target: reference src/geometry/epipolar_lines.py `project_rays`'s
`overlaps_image` flag, which the evaluation-index generator uses to measure
view overlap (reference src/evaluation/evaluation_index_generator.py:79-94).

A ray overlaps a target image iff some point along it (in front of the
target camera) projects inside the unit image square. Instead of the
reference's exact segment-intersection case analysis, points are sampled
log-uniformly along the ray — vectorized, jit-friendly, and equivalent for
overlap *fractions* at the tolerances used for index bucketing.
"""
from __future__ import annotations

import jax.numpy as jnp

from .projection import project


def ray_image_overlap(
    origins: jnp.ndarray,      # (N, 3) world
    directions: jnp.ndarray,   # (N, 3) unit
    extrinsics: jnp.ndarray,   # (4, 4) target c2w
    intrinsics: jnp.ndarray,   # (3, 3) target normalized K
    t_min: float = 1e-3,
    t_max: float = 1e3,
    num_samples: int = 64,
) -> jnp.ndarray:
    """(N,) bool: does each ray project into the target image anywhere?"""
    ts = jnp.logspace(jnp.log10(t_min), jnp.log10(t_max), num_samples)
    pts = origins[:, None, :] + directions[:, None, :] * ts[None, :, None]
    xy, in_front = project(pts, extrinsics, intrinsics)
    inside = (
        (xy[..., 0] >= 0.0) & (xy[..., 0] <= 1.0)
        & (xy[..., 1] >= 0.0) & (xy[..., 1] <= 1.0)
        & in_front
    )
    return inside.any(axis=-1)


def view_overlap_fraction(
    extrinsics_a: jnp.ndarray,
    intrinsics_a: jnp.ndarray,
    extrinsics_b: jnp.ndarray,
    intrinsics_b: jnp.ndarray,
    grid: int = 32,
) -> jnp.ndarray:
    """Fraction of view-A rays that epipolarly overlap view B's image."""
    from .projection import get_world_rays, sample_image_grid

    xy, _ = sample_image_grid((grid, grid))
    origins, dirs = get_world_rays(
        xy.reshape(-1, 2), extrinsics_a, intrinsics_a
    )
    return ray_image_overlap(origins, dirs, extrinsics_b, intrinsics_b).mean()
