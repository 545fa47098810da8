"""Orthographic Gaussian projections for validation visuals.

Parity target: reference src/visualization/validation_in_3d.py:25-100 +
render_cuda_orthographic (cuda_splatting.py:242-333): fake an orthographic
camera by moving it far back with a tiny field of view, then render the
Gaussian scene along +x / +y / +z axes.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..decoder.splatting import DecoderSplattingConfig, decoder_forward
from ..models.adapter import Gaussians


def _look_at(forward: np.ndarray, up: np.ndarray, position: np.ndarray):
    f = forward / np.linalg.norm(forward)
    r = np.cross(up, f)
    r = r / np.linalg.norm(r)
    u = np.cross(f, r)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = r, u, f, position
    return m


def orthographic_camera(direction: str, extent: float, margin: float = 1.2,
                        fov_degrees: float = 0.5):
    """c2w + normalized K approximating an orthographic view along an axis."""
    half = extent * margin
    distance = half / math.tan(math.radians(fov_degrees) / 2)
    axes = {
        "x": (np.array([1.0, 0, 0]), np.array([0, -1.0, 0])),
        "y": (np.array([0, 1.0, 0]), np.array([0, 0, 1.0])),
        "z": (np.array([0, 0, 1.0]), np.array([0, -1.0, 0])),
    }
    fwd, up = axes[direction]
    c2w = _look_at(fwd, up, -fwd * distance)
    f = 0.5 / math.tan(math.radians(fov_degrees) / 2)
    K = np.array([[f, 0, 0.5], [0, f, 0.5], [0, 0, 1.0]], np.float32)
    return c2w, K, distance


def render_projections(
    gaussians: Gaussians,
    resolution: int = 256,
    directions: tuple = ("x", "y", "z"),
    dec_cfg: DecoderSplattingConfig = DecoderSplattingConfig(),
) -> np.ndarray:
    """Render near-orthographic projections of the scene. Returns
    (len(directions), resolution, resolution, 3)."""
    means = np.asarray(gaussians.means).reshape(-1, 3)
    center = means.mean(0)
    extent = float(np.abs(means - center).max() + 1e-3)

    images = []
    for d in directions:
        c2w, K, distance = orthographic_camera(d, extent)
        c2w[:3, 3] += center
        out = decoder_forward(
            dec_cfg, gaussians,
            jnp.asarray(c2w)[None, None], jnp.asarray(K)[None, None],
            jnp.full((1, 1), distance - extent),
            jnp.full((1, 1), distance + 3 * extent),
            (resolution, resolution),
        )
        images.append(np.asarray(out.color[0, 0]))
    return np.stack(images)
