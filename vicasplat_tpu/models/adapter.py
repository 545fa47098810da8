"""Gaussian adapter: raw head outputs -> 3D Gaussian parameters.

Parity target: reference src/model/encoder/common/gaussian_adapter.py
(MyGaussianAdapter, :167-212) and gaussians.py build_covariance (:33-44).

Raw layout per pixel (sh_degree=4 flagship: 86 channels total):
  [xyz(3) | opacity(1) | scale(3) | rotation xyzw(4) | sh(3*(deg+1)^2)]
where xyz comes from the DPT center head and the rest from the GS-param head.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry.quaternion import quat_to_matrix


class Gaussians(NamedTuple):
    """Pixel-aligned Gaussian scene; leading dims arbitrary (*batch)."""

    means: jnp.ndarray        # (..., 3)
    covariances: jnp.ndarray  # (..., 3, 3)
    harmonics: jnp.ndarray    # (..., 3, d_sh)
    opacities: jnp.ndarray    # (...,)
    scales: jnp.ndarray       # (..., 3)
    rotations: jnp.ndarray    # (..., 4) xyzw


@dataclasses.dataclass(frozen=True)
class GaussianAdapterConfig:
    gaussian_scale_min: float = 0.005
    gaussian_scale_max: float = 0.04
    sh_degree: int = 4
    scale_act: str = "softplus"  # bounded | exp | softplus

    @property
    def d_sh(self) -> int:
        return (self.sh_degree + 1) ** 2

    @property
    def d_in(self) -> int:
        return 7 + 3 * self.d_sh

    @property
    def raw_gs_dim(self) -> int:
        return 1 + self.d_in  # +1 opacity


def sh_degree_mask(sh_degree: int) -> jnp.ndarray:
    """Per-coefficient mask biasing init toward the DC term: degree d gets
    0.1 * 0.25^d (reference gaussian_adapter.py:44-50)."""
    mask = [1.0]
    for deg in range(1, sh_degree + 1):
        mask.extend([0.1 * 0.25**deg] * (2 * deg + 1))
    return jnp.asarray(mask, jnp.float32)


def build_covariance(scales: jnp.ndarray, rotations_xyzw: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R diag(s) diag(s) R^T."""
    R = quat_to_matrix(rotations_xyzw)
    RS = R * scales[..., None, :]  # R @ diag(s)
    return RS @ jnp.swapaxes(RS, -1, -2)


def adapt_gaussians(
    raw: jnp.ndarray,
    cfg: GaussianAdapterConfig,
    opacity_map: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    eps: float = 1e-8,
) -> Gaussians:
    """raw: (..., 1 + 10 + 3*d_sh) channel-last head output."""
    raw = raw.astype(jnp.float32)
    xyz = raw[..., 0:3]
    opacity = raw[..., 3]
    scales = raw[..., 4:7]
    rotations = raw[..., 7:11]
    sh = raw[..., 11:]
    sh = sh.reshape(*sh.shape[:-1], 3, cfg.d_sh) * sh_degree_mask(cfg.sh_degree)

    opacity = jax.nn.sigmoid(opacity)
    if opacity_map is not None:
        opacity = opacity_map(opacity)

    if cfg.scale_act == "bounded":
        lo, hi = cfg.gaussian_scale_min, cfg.gaussian_scale_max
        scales = lo + (hi - lo) * jax.nn.sigmoid(scales)
    elif cfg.scale_act == "exp":
        scales = jnp.minimum(jnp.exp(scales), 0.3)
    elif cfg.scale_act == "softplus":
        scales = jnp.minimum(0.001 * jax.nn.softplus(scales), 0.3)
    else:
        raise ValueError(cfg.scale_act)

    norm = jnp.linalg.norm(rotations, axis=-1, keepdims=True)
    rotations = rotations / jnp.maximum(norm, eps)

    return Gaussians(
        means=xyz,
        covariances=build_covariance(scales, rotations),
        harmonics=sh,
        opacities=opacity,
        scales=scales,
        rotations=rotations,
    )


def opacity_warmup_map(cfg_initial: float, cfg_final: float, warm_up: int,
                       global_step) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """pdf -> opacity warm-up mapping (reference vicasplat.py:143-156).

    With the shipped config (initial=final=0) the exponent is 1 and the map
    reduces to identity.
    """
    frac = jnp.minimum(jnp.asarray(global_step, jnp.float32) / warm_up, 1.0)
    x = cfg_initial + frac * (cfg_final - cfg_initial)
    exponent = 2.0**x

    def _map(pdf):
        return 0.5 * (1 - (1 - pdf) ** exponent + pdf ** (1 / exponent))

    return _map
