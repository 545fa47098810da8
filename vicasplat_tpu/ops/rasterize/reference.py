"""Brute-force per-pixel reference renderer (golden-value oracle).

Evaluates every Gaussian at every pixel in exact global depth order — O(P*N),
only for tiny test scenes. The tiled production path (tiles.py) must agree
with this within padding/cap effects; tests compare the two.
"""
from __future__ import annotations

import jax.numpy as jnp

from .projection import project_gaussians


def render_view_bruteforce(
    means, covariances, harmonics, opacities,
    viewmat, intrinsics, image_shape, background, sh_degree, near=0.2,
):
    H, W = image_shape
    s = project_gaussians(
        means, covariances, harmonics, opacities, viewmat, intrinsics,
        image_shape, sh_degree, near=near,
    )
    order = jnp.argsort(s.depth)
    mean2d = s.mean2d[order]
    conic = s.conic[order]
    color = s.color[order]
    alpha = jnp.where(s.radius[order] > 0, s.alpha[order], 0.0)
    depth = s.depth[order]

    ys, xs = jnp.meshgrid(jnp.arange(H) + 0.5, jnp.arange(W) + 0.5, indexing="ij")
    dx = xs.reshape(-1, 1) - mean2d[None, :, 0]  # (P, N)
    dy = ys.reshape(-1, 1) - mean2d[None, :, 1]
    power = (
        -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy)
        - conic[None, :, 1] * dx * dy
    )
    a = jnp.minimum(0.99, alpha[None, :] * jnp.exp(jnp.minimum(power, 0.0)))
    a = jnp.where((power > 0.0) | (a < 1.0 / 255.0), 0.0, a)

    logom = jnp.log1p(-a)
    # exclusive prefix over N (front-to-back)
    prefix = jnp.concatenate(
        [jnp.zeros_like(logom[:, :1]), jnp.cumsum(logom, axis=1)[:, :-1]], axis=1
    )
    w = jnp.exp(prefix) * a
    rgb = w @ color
    dep = (w * depth[None, :]).sum(-1)
    asum = w.sum(-1)
    t_final = jnp.exp(logom.sum(1))
    rgb = rgb + t_final[:, None] * background
    return (
        rgb.reshape(H, W, 3),
        dep.reshape(H, W),
        asum.reshape(H, W),
    )
