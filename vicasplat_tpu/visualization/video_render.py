"""Video rendering helpers: wobble + interpolation trajectory videos from a
Gaussian scene.

Parity target: reference src/visualization/video_render.py and the
ModelWrapper video renderers (model_wrapper.py:685-832).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..decoder.splatting import DecoderSplattingConfig, decoder_forward
from ..models.adapter import Gaussians
from .camera_trajectory import (
    generate_wobble,
    interpolate_extrinsics,
    interpolate_trajectory,
)


def render_video_wobble(
    gaussians: Gaussians,
    extrinsics: jnp.ndarray,   # (V, 4, 4) context c2w — wobbles around view 0
    intrinsics: jnp.ndarray,   # (V, 3, 3)
    image_shape: tuple,
    num_frames: int = 60,
    dec_cfg: DecoderSplattingConfig = DecoderSplattingConfig(),
) -> np.ndarray:
    delta = float(jnp.linalg.norm(extrinsics[0, :3, 3] - extrinsics[-1, :3, 3]))
    t = jnp.linspace(0, 1, num_frames)
    traj = generate_wobble(extrinsics[0], 0.25 * delta, t)
    K = jnp.broadcast_to(intrinsics[0], (num_frames, 3, 3))
    out = decoder_forward(
        dec_cfg, gaussians, traj[None], K[None],
        jnp.full((1, num_frames), 0.05), jnp.full((1, num_frames), 100.0),
        image_shape,
    )
    return np.asarray(out.color[0])


def render_video_interpolation(
    gaussians: Gaussians,
    extrinsics: jnp.ndarray,   # (V, 4, 4) predicted poses
    intrinsics: jnp.ndarray,
    image_shape: tuple,
    steps_per_segment: int = 10,
    dec_cfg: DecoderSplattingConfig = DecoderSplattingConfig(),
) -> np.ndarray:
    traj = interpolate_trajectory(extrinsics, steps_per_segment)
    n = traj.shape[0]
    K = jnp.broadcast_to(intrinsics[0], (n, 3, 3))
    out = decoder_forward(
        dec_cfg, gaussians, traj[None], K[None],
        jnp.full((1, n), 0.05), jnp.full((1, n), 100.0), image_shape,
    )
    return np.asarray(out.color[0])
