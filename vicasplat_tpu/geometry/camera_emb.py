"""Camera-intrinsics ray embedding: per-pixel ray directions encoded with
real spherical harmonics.

Parity target: reference src/geometry/camera_emb.py:7-29 (get_intrinsic_
embedding; unused in the reference's default path, which embeds the raw 3x3
via a linear layer — kept for API completeness).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.sh import sh_basis
from .projection import get_local_rays, sample_image_grid


def get_intrinsic_embedding(
    intrinsics: jnp.ndarray,  # (..., 3, 3) normalized K
    image_shape: tuple,       # (H, W)
    degree: int = 4,
    merge_hw: bool = False,
) -> jnp.ndarray:
    """-> (..., H, W, (degree+1)^2) SH features of camera-space ray dirs."""
    coords, _ = sample_image_grid(image_shape)
    dirs = get_local_rays(
        coords, intrinsics[..., None, None, :, :]
    )
    emb = sh_basis(dirs, degree)
    if merge_hw:
        emb = emb.reshape(*emb.shape[:-3], -1, emb.shape[-1])
    return emb
