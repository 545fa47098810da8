"""Tile binning + alpha compositing for the TPU rasterizer.

The CUDA reference builds variable-length per-tile lists with atomics and
walks them with per-pixel early exit. Neither maps to TPU. This design is
fully static-shape and turns compositing into matmuls:

1. **Binning**: each projected splat emits up to KH*KW (tile, depth, id)
   entries for the tiles its 3-sigma rect overlaps (window centered on the
   rect when it exceeds the cap). One lexicographic `lax.sort` over
   (tile, depth) orders everything front-to-back per tile; per-tile segments
   are found with `searchsorted` and gathered into a dense
   (num_tiles, K, payload) tensor (front-most K per tile kept — compositing
   saturates long before K in practice).

2. **Compositing**: for a chunk of G splats over P pixels, the transmittance
   prefix T_g = exp(sum_{g'<g} log(1-alpha_g')) is an *exclusive cumulative
   sum*, computed as `log1m_alpha @ U` with U strictly-upper-triangular ones —
   an MXU matmul instead of a serial loop. Blending weights w = T * alpha
   then accumulate color/depth via another matmul. A `lax.scan` carries the
   running log-transmittance across chunks; each chunk is rematerialized in
   the backward pass (jax.checkpoint), so autodiff yields the standard 3DGS
   backward without storing per-splat intermediates.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import Splats


class TileBins(NamedTuple):
    mean2d: jnp.ndarray  # (num_tiles, K, 2)
    conic: jnp.ndarray   # (num_tiles, K, 3)
    color: jnp.ndarray   # (num_tiles, K, 3)
    alpha: jnp.ndarray   # (num_tiles, K)  0 where padded/invalid
    depth: jnp.ndarray   # (num_tiles, K)


def bin_splats(
    splats: Splats,
    image_shape: tuple,
    tile_px: int,
    dup_hw: tuple,
    max_per_tile: int,
) -> TileBins:
    H, W = image_shape
    th = -(-H // tile_px)
    tw = -(-W // tile_px)
    num_tiles = th * tw
    n = splats.mean2d.shape[0]
    KH, KW = dup_hw
    kdup = KH * KW

    mx, my = splats.mean2d[:, 0], splats.mean2d[:, 1]
    r = splats.radius
    live = r > 0

    tx0 = jnp.clip(jnp.floor((mx - r) / tile_px), 0, tw - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mx + r) / tile_px), 0, tw - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((my - r) / tile_px), 0, th - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((my + r) / tile_px), 0, th - 1).astype(jnp.int32)

    # window of at most KH x KW tiles, centered on the splat's rect
    ctx = jnp.clip(jnp.floor(mx / tile_px), 0, tw - 1).astype(jnp.int32)
    cty = jnp.clip(jnp.floor(my / tile_px), 0, th - 1).astype(jnp.int32)
    wx0 = jnp.clip(ctx - (KW - 1) // 2, tx0, jnp.maximum(tx1 - KW + 1, tx0))
    wy0 = jnp.clip(cty - (KH - 1) // 2, ty0, jnp.maximum(ty1 - KH + 1, ty0))

    dy = jnp.arange(KH, dtype=jnp.int32)
    dx = jnp.arange(KW, dtype=jnp.int32)
    tys = wy0[:, None, None] + dy[None, :, None]  # (n, KH, 1)
    txs = wx0[:, None, None] + dx[None, None, :]  # (n, 1, KW)
    in_rect = (
        (tys <= ty1[:, None, None])
        & (txs <= tx1[:, None, None])
        & live[:, None, None]
    )
    tile_ids = jnp.where(in_rect, tys * tw + txs, num_tiles).reshape(n * kdup)
    depths = jnp.broadcast_to(
        splats.depth[:, None, None], (n, KH, KW)
    ).reshape(n * kdup)
    gauss_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None, None], (n, KH, KW)
    ).reshape(n * kdup)

    # global front-to-back order within each tile: one lexicographic sort
    sorted_tiles, _, sorted_idx = jax.lax.sort(
        (tile_ids, depths, gauss_idx), num_keys=2
    )

    tile_range = jnp.arange(num_tiles, dtype=sorted_tiles.dtype)
    starts = jnp.searchsorted(sorted_tiles, tile_range, side="left")
    ends = jnp.searchsorted(sorted_tiles, tile_range, side="right")

    k = jnp.arange(max_per_tile, dtype=jnp.int32)
    slots = starts[:, None] + k[None, :]  # (num_tiles, K)
    slot_valid = slots < ends[:, None]
    slots = jnp.clip(slots, 0, n * kdup - 1)
    ids = sorted_idx[slots]  # (num_tiles, K)

    return TileBins(
        mean2d=splats.mean2d[ids],
        conic=splats.conic[ids],
        color=splats.color[ids],
        alpha=jnp.where(slot_valid, splats.alpha[ids], 0.0),
        depth=splats.depth[ids],
    )


def _tile_pixel_centers(image_shape, tile_px):
    """(num_tiles, P, 2) pixel-center coordinates per tile."""
    H, W = image_shape
    th = -(-H // tile_px)
    tw = -(-W // tile_px)
    ty, tx = jnp.meshgrid(jnp.arange(th), jnp.arange(tw), indexing="ij")
    oy, ox = jnp.meshgrid(jnp.arange(tile_px), jnp.arange(tile_px), indexing="ij")
    px = tx.reshape(-1, 1) * tile_px + ox.reshape(1, -1) + 0.5
    py = ty.reshape(-1, 1) * tile_px + oy.reshape(1, -1) + 0.5
    return jnp.stack([px, py], axis=-1).astype(jnp.float32)  # (T, P, 2)


def _composite_group(bins: TileBins, pix: jnp.ndarray, chunk: int):
    """Composite one group of tiles. pix: (T, P, 2). Returns rgb (T,P,3),
    depth (T,P), alpha (T,P)."""
    T_, K = bins.alpha.shape
    P = pix.shape[1]
    n_chunks = K // chunk
    assert n_chunks * chunk == K, "max_per_tile must be a multiple of chunk"

    # strictly-upper-triangular ones: exclusive prefix via matmul
    tri = jnp.triu(jnp.ones((chunk, chunk), jnp.float32), k=1)

    def chunk_step(carry, idx):
        log_t, rgb, dep, asum = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, idx * chunk, chunk, axis=1)
        m2d = sl(bins.mean2d)
        con = sl(bins.conic)
        col = sl(bins.color)
        alp = sl(bins.alpha)
        dpt = sl(bins.depth)

        dx = pix[:, :, None, 0] - m2d[:, None, :, 0]  # (T, P, G)
        dy = pix[:, :, None, 1] - m2d[:, None, :, 1]
        power = (
            -0.5 * (con[:, None, :, 0] * dx * dx + con[:, None, :, 2] * dy * dy)
            - con[:, None, :, 1] * dx * dy
        )
        a = jnp.minimum(0.99, alp[:, None, :] * jnp.exp(jnp.minimum(power, 0.0)))
        a = jnp.where((power > 0.0) | (a < 1.0 / 255.0), 0.0, a)

        logom = jnp.log1p(-a)  # (T, P, G)
        # exclusive prefix along G (front-to-back transmittance within chunk)
        prefix = jnp.einsum("tpg,gh->tph", logom, tri)
        w = jnp.exp(log_t[:, :, None] + prefix) * a  # blending weights

        feats = jnp.concatenate([col, dpt[:, :, None]], axis=-1)  # (T, G, 4)
        acc = jnp.einsum("tpg,tgf->tpf", w, feats)
        rgb = rgb + acc[..., :3]
        dep = dep + acc[..., 3]
        asum = asum + w.sum(-1)
        log_t = log_t + logom.sum(-1)
        return (log_t, rgb, dep, asum), None

    init = (
        jnp.zeros((T_, P), jnp.float32),
        jnp.zeros((T_, P, 3), jnp.float32),
        jnp.zeros((T_, P), jnp.float32),
        jnp.zeros((T_, P), jnp.float32),
    )
    (log_t, rgb, dep, asum), _ = jax.lax.scan(
        jax.checkpoint(chunk_step), init, jnp.arange(n_chunks)
    )
    return rgb, dep, asum, jnp.exp(log_t)


def composite_tiles(
    bins: TileBins,
    image_shape: tuple,
    tile_px: int,
    background: jnp.ndarray,  # (3,)
    chunk: int = 128,
    tile_group: int = 64,
):
    """Full-image compositing. Returns (rgb (H,W,3), depth (H,W), alpha (H,W))."""
    H, W = image_shape
    th = -(-H // tile_px)
    tw = -(-W // tile_px)
    num_tiles = th * tw
    pix = _tile_pixel_centers(image_shape, tile_px)

    assert num_tiles % tile_group == 0, "tile count must divide into groups"
    n_groups = num_tiles // tile_group

    def group_fn(gi):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, gi * tile_group, tile_group, 0)
        gbins = TileBins(*(sl(b) for b in bins))
        return _composite_group(gbins, sl(pix), chunk)

    rgb, dep, asum, t_final = jax.lax.map(group_fn, jnp.arange(n_groups))
    # (n_groups, tile_group, P, ...) -> (num_tiles, P, ...)
    rgb = rgb.reshape(num_tiles, -1, 3)
    dep = dep.reshape(num_tiles, -1)
    asum = asum.reshape(num_tiles, -1)
    t_final = t_final.reshape(num_tiles, -1)

    rgb = rgb + t_final[..., None] * background.astype(rgb.dtype)

    def stitch(x):
        c = x.shape[2:]
        x = x.reshape(th, tw, tile_px, tile_px, *c)
        x = jnp.moveaxis(x, 2, 1).reshape(th * tile_px, tw * tile_px, *c)
        return x[:H, :W]

    return stitch(rgb), stitch(dep), stitch(asum)
