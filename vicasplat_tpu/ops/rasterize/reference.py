"""Brute-force per-pixel reference renderer (golden-value oracle).

Evaluates every Gaussian at every pixel in exact global depth order — O(P*N),
only for tiny test scenes. The tiled production path (tiles.py) must agree
with this within padding/cap effects; tests compare the two.
"""
from __future__ import annotations

import jax
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

def render_view_bruteforce_chunked(
    means, covariances, harmonics, opacities,
    viewmat, intrinsics, image_shape, background, sh_degree, near=0.2,
    px_chunk=512,
):
    """Exact bruteforce oracle for LARGE scenes: identical math to
    `render_view_bruteforce`, evaluated in pixel chunks under `lax.map` so
    the (P, N) pairwise buffers never exceed (px_chunk, N). Used by the
    rasterizer-cap quality study (outputs/rasterizer_caps) where N ~ 5e5
    makes the dense form a 137 GB allocation.
    """
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
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)  # (P, 2)
    P = pix.shape[0]
    pad = (-P) % px_chunk
    pix = jnp.pad(pix, ((0, pad), (0, 0)))
    blocks = pix.reshape(-1, px_chunk, 2)

    def one_block(b):  # (px_chunk, 2)
        dx = b[:, :1] - mean2d[None, :, 0]
        dy = b[:, 1:2] - mean2d[None, :, 1]
        power = (
            -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy)
            - conic[None, :, 1] * dx * dy
        )
        a = jnp.minimum(0.99, alpha[None, :] * jnp.exp(jnp.minimum(power, 0.0)))
        a = jnp.where((power > 0.0) | (a < 1.0 / 255.0), 0.0, a)
        logom = jnp.log1p(-a)
        prefix = jnp.concatenate(
            [jnp.zeros_like(logom[:, :1]), jnp.cumsum(logom, axis=1)[:, :-1]],
            axis=1,
        )
        w = jnp.exp(prefix) * a
        rgb = w @ color
        dep = (w * depth[None, :]).sum(-1)
        asum = w.sum(-1)
        t_final = jnp.exp(logom.sum(1))
        rgb = rgb + t_final[:, None] * background
        return rgb, dep, asum

    rgb, dep, asum = jax.lax.map(one_block, blocks)
    rgb = rgb.reshape(-1, 3)[:P].reshape(H, W, 3)
    dep = dep.reshape(-1)[:P].reshape(H, W)
    asum = asum.reshape(-1)[:P].reshape(H, W)
    return rgb, dep, asum
