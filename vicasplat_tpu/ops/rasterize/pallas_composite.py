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

STATUS: experimental — measured on v5e this kernel currently loses to the
XLA matmul formulation (the tiny per-chunk blocks underutilize the pipeline;
the early-exit predication doesn't offset that at 512-splat tile depth), so
RasterizeConfig defaults to backend="xla". Kept as the base for a fused
binning+compositing kernel in a future revision.
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


def _kernel(base_ref, payload_ref, out_ref, logt_ref, rgbd_ref, *,
            tile_px: int, chunk: int, tiles_x: int, n_chunks: int):
    """Grid = (tiles_in_group, n_chunks); the chunk axis is innermost, so the
    (logt, rgbd) VMEM scratch carries per-tile compositing state across grid
    steps. Saturated tiles skip whole chunks via @pl.when — the early exit."""
    P = tile_px * tile_px
    G = chunk

    j = pl.program_id(1)
    tile_id = pl.program_id(0) + base_ref[0]
    ty = tile_id // tiles_x
    tx = tile_id % tiles_x

    @pl.when(j == 0)
    def _init():
        logt_ref[:] = jnp.zeros((P, 1), jnp.float32)
        rgbd_ref[:] = jnp.zeros((P, 4), jnp.float32)

    alive = jnp.max(logt_ref[:]) > _LOG_T_EPS

    @pl.when(alive)
    def _composite_chunk():
        # pixel centers as (P, 1) columns (Mosaic can't shape-cast (t, t) ->
        # (P, 1), so derive row/col from a linear iota)
        lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        oy = (lin // tile_px).astype(jnp.float32)
        ox = (lin % tile_px).astype(jnp.float32)
        px = (tx * tile_px).astype(jnp.float32) + ox + 0.5
        py = (ty * tile_px).astype(jnp.float32) + oy + 0.5

        pl_chunk = payload_ref[0]  # (G, 16) — block is pipelined per (i, j)
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
        tri = jnp.triu(jnp.ones((G, G), jnp.float32), k=1)
        prefix = jnp.dot(logom, tri, preferred_element_type=jnp.float32)
        w = jnp.exp(logt_ref[:] + prefix) * a  # (P, G)

        feats = pl_chunk[:, 6:10]  # (G, 4)
        rgbd_ref[:] = rgbd_ref[:] + jnp.dot(
            w, feats, preferred_element_type=jnp.float32
        )
        logt_ref[:] = logt_ref[:] + jnp.sum(logom, axis=1, keepdims=True)

    @pl.when(j == n_chunks - 1)
    def _finalize():
        out_ref[0] = jnp.concatenate(
            [rgbd_ref[:], jnp.exp(logt_ref[:]), jnp.zeros((P, 3), jnp.float32)],
            axis=1,
        )  # (P, 8): rgb, depth, T_final, pad


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
        grid=(tile_group, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda i, j, base_ref: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, 8), lambda i, j, base_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 4), jnp.float32),
        ],
    )

    def call(args):
        group_payload, base = args
        return pl.pallas_call(
            kernel,
            interpret=interpret,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tile_group, P, 8), jnp.float32),
            # Mosaic's conservative scoped-vmem accounting rejects this
            # kernel at the default 16MB limit; measured live usage is far
            # lower, and v5e VMEM accommodates the raised cap.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
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
