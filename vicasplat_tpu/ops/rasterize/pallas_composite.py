"""Pallas TPU kernel: per-tile alpha compositing with early termination.

The XLA compositing path (tiles.composite_tiles) processes every one of the
K binned splats for every tile; saturated tiles (transmittance < 1e-4 after a
few dozen splats) waste most of that work, and each chunk's (tiles, P, G)
intermediates round-trip HBM. This kernel keeps everything in VMEM:

  - grid = (num_tiles / TB, K / G) with the chunk axis innermost; each step
    owns TB tiles x one G-splat payload chunk as a pipelined VMEM block, and
    (log-transmittance, rgbd) VMEM scratch carries compositing state across
    chunk steps — no HBM traffic for intermediates at all;
  - chunks are skipped via @pl.when as soon as every pixel in the TB-tile
    block is saturated (the TPU-shaped version of the CUDA rasterizer's
    per-pixel early exit; adjacent tiles correlate spatially, so block-level
    exit loses little — the skipped chunk's payload DMA still happens but is
    a bandwidth rounding error);
  - the transmittance prefix inside a chunk is the strictly-upper-triangular
    matmul trick from the XLA path (MXU work), evaluated per tile as a
    batched (P, G) x (G, G) dot.

v1 of this kernel (one tile per grid step, chunk axis in the grid) lost 15x
to XLA: (1, G, 16) blocks thrashed the pipeline. Multi-tile VMEM-resident
blocks fix that.

The backward rematerializes through the (numerically identical) XLA path via
custom_vjp, so training gradients are unchanged while inference gets the
fast kernel.

Reference parity: alpha clamp/skip semantics match the CUDA rasterizer
(reference diff-gaussian-rasterization-w-pose via cuda_splatting.py:148-239):
alpha capped at 0.99, contributions below 1/255 skipped, positive power
skipped.
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


def _kernel(payload_ref, out_ref, logt_ref, rgbd_ref, *, tile_px: int,
            chunk: int, n_chunks: int, tiles_x: int, tile_block: int):
    """Grid = (tile_blocks, n_chunks), chunk axis innermost so the
    (logt, rgbd) VMEM scratch carries per-tile compositing state across
    chunk steps while the next chunk's payload block DMA overlaps compute.
    payload_ref: (TB, G, 16) VMEM block; out_ref: (TB, P, 8)."""
    P = tile_px * tile_px
    G = chunk
    TB = tile_block

    j = pl.program_id(1)
    # program_id must be read at kernel top level: calling it inside a
    # pl.when closure captures it as a closed-call const, which the
    # interpret-mode lowering rejects
    base_tile = pl.program_id(0) * TB

    @pl.when(j == 0)
    def _init():
        logt_ref[...] = jnp.zeros((TB, P, 1), jnp.float32)
        rgbd_ref[...] = jnp.zeros((TB, P, 4), jnp.float32)

    # block-level early exit: skip whole chunks once every pixel of every
    # tile in the block is saturated (adjacent tiles correlate spatially)
    alive = jnp.max(logt_ref[...]) > _LOG_T_EPS

    @pl.when(alive)
    def _composite_chunk():
        # per-tile pixel centers: (TB, P, 1) columns
        lin = jax.lax.broadcasted_iota(jnp.int32, (TB, P, 1), 1)
        tloc = jax.lax.broadcasted_iota(jnp.int32, (TB, P, 1), 0)
        tile_id = base_tile + tloc
        ty = tile_id // tiles_x
        tx = tile_id % tiles_x
        oy = (lin // tile_px).astype(jnp.float32)
        ox = (lin % tile_px).astype(jnp.float32)
        px = (tx * tile_px).astype(jnp.float32) + ox + 0.5
        py = (ty * tile_px).astype(jnp.float32) + oy + 0.5

        pc = payload_ref[...]  # (TB, G, 16)
        mx = pc[:, :, 0][:, None, :]
        my = pc[:, :, 1][:, None, :]
        ca = pc[:, :, 2][:, None, :]
        cb = pc[:, :, 3][:, None, :]
        cc = pc[:, :, 4][:, None, :]
        alp = pc[:, :, 5][:, None, :]

        dx = px - mx  # (TB, P, G)
        dy = py - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        a = jnp.minimum(0.99, alp * jnp.exp(jnp.minimum(power, 0.0)))
        a = jnp.where((power > 0.0) | (a < 1.0 / 255.0), 0.0, a)

        logom = jnp.log1p(-a)  # (TB, P, G)
        # strictly-upper-triangular ones via iota (a materialized constant
        # would be captured as a pallas closure const, unsupported)
        gi = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
        gj = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
        tri = (gi < gj).astype(jnp.float32)
        prefix = jax.lax.dot_general(
            logom, tri, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        w = jnp.exp(logt_ref[...] + prefix) * a

        feats = pc[:, :, 6:10]  # (TB, G, 4)
        acc = jax.lax.dot_general(
            w, feats, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        rgbd_ref[...] = rgbd_ref[...] + acc
        logt_ref[...] = logt_ref[...] + jnp.sum(logom, axis=2, keepdims=True)

    @pl.when(j == n_chunks - 1)
    def _finalize():
        out_ref[...] = jnp.concatenate(
            [rgbd_ref[...], jnp.exp(logt_ref[...]),
             jnp.zeros((TB, P, 3), jnp.float32)], axis=2
        )  # (TB, P, 8): rgb, depth, T_final, pad


def _composite_pallas_raw(payload: jnp.ndarray, tile_px: int, chunk: int,
                          tiles_x: int, tile_block: int = 8) -> jnp.ndarray:
    num_tiles, K, C = payload.shape
    P = tile_px * tile_px
    tile_block = min(tile_block, num_tiles)
    assert num_tiles % tile_block == 0
    assert K % chunk == 0
    kernel = functools.partial(
        _kernel, tile_px=tile_px, chunk=chunk, n_chunks=K // chunk,
        tiles_x=tiles_x, tile_block=tile_block,
    )
    interpret = jax.default_backend() == "cpu"  # tests run interpreted
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_tiles // tile_block, K // chunk),
        in_specs=[
            pl.BlockSpec((tile_block, chunk, C), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_block, P, 8), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_block, P, 1), jnp.float32),
            pltpu.VMEM((tile_block, P, 4), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, P, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_tiles * P * K * chunk // 4,
            bytes_accessed=num_tiles * K * C * 4 + num_tiles * P * 8 * 4,
            transcendentals=num_tiles * P * K,
        ),
    )(payload)


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
