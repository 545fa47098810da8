"""Pallas TPU kernel: fused per-tile alpha compositing with early termination.

The XLA compositing path (tiles.composite_tiles) processes every one of the
K binned splats per tile; saturated tiles (transmittance < 1e-4 after a few
dozen splats) waste most of that work. This kernel runs one grid step per
tile with the payload block pipelined HBM->VMEM, and a `while_loop` over
G-splat chunks that stops as soon as every pixel in the tile is opaque —
the TPU equivalent of the CUDA rasterizer's per-pixel early exit (coarsened
to tile granularity, which is what the tile-level matmul formulation wants).

Forward-only: `composite_tiles_pallas` is wrapped in a custom_vjp whose
backward rematerializes through the (numerically identical) XLA path, so
training gets the same gradients while inference gets the fast kernel.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiles import TileBins, composite_tiles as composite_tiles_xla

_LOG_T_EPS = math.log(1e-4)  # stop once max transmittance under this


def _kernel(base_ref, payload_ref, out_ref, *, tile_px: int, chunk: int,
            tiles_x: int, n_chunks: int):
    P = tile_px * tile_px
    G = chunk

    tile_id = pl.program_id(0) + base_ref[0]
    ty = tile_id // tiles_x
    tx = tile_id % tiles_x

    # pixel centers of this tile as (P, 1) columns. Mosaic can't shape-cast
    # (t, t) -> (P, 1), so derive row/col from a linear (P, 1) iota.
    lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    oy = (lin // tile_px).astype(jnp.float32)
    ox = (lin % tile_px).astype(jnp.float32)
    px = (tx * tile_px).astype(jnp.float32) + ox + 0.5
    py = (ty * tile_px).astype(jnp.float32) + oy + 0.5

    tri = jnp.triu(jnp.ones((G, G), jnp.float32), k=1)

    def chunk_body(state):
        idx, log_t, rgbd, _ = state
        pl_chunk = payload_ref[0, pl.ds(idx * G, G), :]  # (G, 16)
        mx = pl_chunk[:, 0][None, :]
        my = pl_chunk[:, 1][None, :]
        ca = pl_chunk[:, 2][None, :]
        cb = pl_chunk[:, 3][None, :]
        cc = pl_chunk[:, 4][None, :]
        alp = pl_chunk[:, 5][None, :]

        dx = px - mx  # (P, G)
        dy = py - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        a = jnp.minimum(0.99, alp * jnp.exp(jnp.minimum(power, 0.0)))
        a = jnp.where((power > 0.0) | (a < 1.0 / 255.0), 0.0, a)

        logom = jnp.log1p(-a)
        prefix = jnp.dot(logom, tri, preferred_element_type=jnp.float32)
        w = jnp.exp(log_t + prefix) * a  # (P, G)

        feats = pl_chunk[:, 6:10]  # (G, 4)
        rgbd = rgbd + jnp.dot(w, feats, preferred_element_type=jnp.float32)
        log_t = log_t + jnp.sum(logom, axis=1, keepdims=True)
        alive = jnp.max(log_t) > _LOG_T_EPS
        return idx + 1, log_t, rgbd, alive

    def cond(state):
        idx, _, _, alive = state
        return (idx < n_chunks) & alive

    init = (
        jnp.int32(0),
        jnp.zeros((P, 1), jnp.float32),
        jnp.zeros((P, 4), jnp.float32),
        jnp.bool_(True),
    )
    _, log_t, rgbd, _ = jax.lax.while_loop(cond, chunk_body, init)

    out = jnp.concatenate(
        [rgbd, jnp.exp(log_t), jnp.zeros((P, 3), jnp.float32)], axis=1
    )  # (P, 8): rgb, depth, T_final, pad
    out_ref[0] = out


def _composite_pallas_raw(payload: jnp.ndarray, tile_px: int, chunk: int,
                          tiles_x: int, tile_group: int = 32) -> jnp.ndarray:
    num_tiles, K, C = payload.shape
    P = tile_px * tile_px
    n_chunks = K // chunk
    kernel = functools.partial(
        _kernel, tile_px=tile_px, chunk=chunk, tiles_x=tiles_x,
        n_chunks=n_chunks,
    )
    interpret = jax.default_backend() == "cpu"  # tests run interpreted
    tile_group = min(tile_group, num_tiles)
    assert num_tiles % tile_group == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tile_group,),
        in_specs=[
            pl.BlockSpec((1, K, C), lambda i, base_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, 8), lambda i, base_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def call(args):
        group_payload, base = args
        return pl.pallas_call(
            kernel,
            interpret=interpret,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tile_group, P, 8), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * tile_group * P * K * 8,
                bytes_accessed=tile_group * K * C * 4 + tile_group * P * 8 * 4,
                transcendentals=tile_group * P * K,
            ),
        )(base.reshape(1), group_payload)

    n_groups = num_tiles // tile_group
    grouped = payload.reshape(n_groups, tile_group, K, C)
    bases = jnp.arange(n_groups, dtype=jnp.int32) * tile_group
    out = jax.lax.map(call, (grouped, bases))
    return out.reshape(num_tiles, P, 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def composite_tiles_pallas(bins: TileBins, image_shape, tile_px, background_tuple,
                           chunk=128):
    """Same contract as tiles.composite_tiles but background is a static
    tuple (hashable for custom_vjp)."""
    return _forward(bins, image_shape, tile_px, background_tuple, chunk)


def _forward(bins, image_shape, tile_px, background_tuple, chunk):
    H, W = image_shape
    th = -(-H // tile_px)
    tw = -(-W // tile_px)
    raw = _composite_pallas_raw(bins.payload, tile_px, chunk, tw)
    rgb = raw[..., :3]
    dep = raw[..., 3]
    t_final = raw[..., 4]
    bg = jnp.asarray(background_tuple, jnp.float32)
    rgb = rgb + t_final[..., None] * bg
    asum = 1.0 - t_final

    def stitch(x):
        c = x.shape[2:]
        x = x.reshape(th, tw, tile_px, tile_px, *c)
        x = jnp.moveaxis(x, 2, 1).reshape(th * tile_px, tw * tile_px, *c)
        return x[:H, :W]

    return stitch(rgb), stitch(dep), stitch(asum)


def _fwd(bins, image_shape, tile_px, background_tuple, chunk):
    out = _forward(bins, image_shape, tile_px, background_tuple, chunk)
    return out, bins


def _bwd(image_shape, tile_px, background_tuple, chunk, bins, g):
    bg = jnp.asarray(background_tuple, jnp.float32)

    def xla_path(b):
        return composite_tiles_xla(b, image_shape, tile_px, bg, chunk=chunk,
                                   tile_group=min(64, b.payload.shape[0]))

    _, vjp = jax.vjp(xla_path, bins)
    return vjp(g)


composite_tiles_pallas.defvjp(_fwd, _bwd)
