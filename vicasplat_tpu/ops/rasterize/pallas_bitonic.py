"""Pallas bitonic sort for the origin-binning candidate merge.

The origin binning path (tiles.bin_splats_origin) needs each tile's
KH*KW*S candidate words depth-sorted. As a pure-XLA reshape/min-max chain
the 66-stage network costs ~1.2 ms/view in HBM traffic (every stage
re-streams the (num_tiles, m) array, tools/jobs/078); in VMEM the whole
array is ~1 MB and the network is ~150M VPU ops (~0.1 ms).

Layout: candidates on SUBLANES, tiles on LANES — shape (m, tiles). Every
compare-exchange stage is then a leading-axis reshape + elementwise
min/max, which Mosaic lowers to sublane selects with no lane shuffles
(lane-axis xor permutations are the expensive pattern on TPU; the
transposed layout never needs one).

Unsigned order: u32 words are sorted as int32 after an XLA-side
`x ^ 0x8000_0000` sign flip (bitwise order of u32 == signed order of the
flipped int32), keeping the kernel in plain int32 ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _bitonic_kernel(x_ref, o_ref, *, m: int, keep: int):
    """Bitonic sort on the leading (sublane) axis. The per-row sort
    direction is applied by selecting between the (min, max) pair and its
    swap with an int32 select — Mosaic cannot lower a select between i1
    vectors (`where(asc, lo>hi, lo<hi)` dies in `arith.trunci` i8->i1) and
    has no `rev` lowering for the all-ascending flip variant."""
    x = x_ref[...]  # (m, LANE) int32
    lanes = x.shape[1]
    k = 2
    while k <= m:
        j = k // 2
        while j >= 1:
            g = m // (2 * j)
            xr = x.reshape(g, 2, j, lanes)
            lo, hi = xr[:, 0], xr[:, 1]
            mn = jnp.minimum(lo, hi)
            mx = jnp.maximum(lo, hi)
            asc = (
                jax.lax.broadcasted_iota(jnp.int32, (g, 1, 1), 0) * (2 * j) & k
            ) == 0
            nlo = jnp.where(asc, mn, mx)
            nhi = jnp.where(asc, mx, mn)
            x = jnp.stack([nlo, nhi], axis=1).reshape(m, lanes)
            j //= 2
        k *= 2
    o_ref[...] = x[:keep]


def bitonic_topk_u32(
    cand: jnp.ndarray, keep: int, interpret: bool = False
) -> jnp.ndarray:
    """Sort u32 words ascending along axis 1, return the first `keep`.

    cand: (num_tiles, m) uint32, m a power of two. Returns (num_tiles, keep)
    uint32. Runs the network in VMEM with tiles on the lane axis.
    """
    t, m = cand.shape
    assert m & (m - 1) == 0, f"bitonic length {m} not a power of two"
    tp = -(-t // LANE) * LANE
    x = cand
    if tp != t:
        x = jnp.pad(x, ((0, tp - t), (0, 0)))
    # transpose to (m, tiles); flip sign bit so int32 order == u32 order
    xt = jax.lax.bitcast_convert_type(
        x.T ^ jnp.uint32(0x80000000), jnp.int32
    )
    kern = functools.partial(_bitonic_kernel, m=m, keep=keep)
    out = pl.pallas_call(
        kern,
        grid=(tp // LANE,),
        in_specs=[pl.BlockSpec((m, LANE), lambda i: (0, i))],
        out_specs=pl.BlockSpec((keep, LANE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((keep, tp), jnp.int32),
        interpret=interpret,
    )(xt)
    out = jax.lax.bitcast_convert_type(out, jnp.uint32) ^ jnp.uint32(0x80000000)
    return out.T[:t]
