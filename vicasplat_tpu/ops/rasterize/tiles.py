"""Tile binning + alpha compositing for the TPU rasterizer.

The CUDA reference builds variable-length per-tile lists with atomics and
walks them with per-pixel early exit. Neither maps to TPU. This design is
fully static-shape and turns compositing into matmuls:

1. **Binning**: each projected splat emits up to KH*KW (key, id) entries for
   the tiles its 3-sigma rect overlaps (window centered on the rect when it
   exceeds the cap). Keys pack (tile_id << 22 | depth_bits) into one uint32 —
   positive-float bits are order-preserving, so a single-key `lax.sort`
   orders everything front-to-back per tile. Per-tile segments come from
   `searchsorted`; the front-most K entries per tile are gathered as rows of
   one packed (N, 16)-float payload table (row gathers keep the 128-lane
   layout dense — per-component gathers with 2/3-wide trailing dims waste
   ~98% of each vector register, measured 5x slower).

2. **Compositing**: for a chunk of G splats over P pixels, the transmittance
   prefix T_g = exp(sum_{g'<g} log(1-alpha_g')) is an *exclusive cumulative
   sum*, computed as `log1m_alpha @ U` with U strictly-upper-triangular ones —
   an MXU matmul instead of a serial loop. Blending weights w = T * alpha
   then accumulate color/depth via another matmul. A `lax.scan` carries the
   running log-transmittance across chunks; each chunk is rematerialized in
   the backward pass (jax.checkpoint), so autodiff yields the standard 3DGS
   backward without storing per-splat intermediates.

All intermediate binning arrays are laid out (slot, N) — trailing dim = the
splat axis — so every elementwise op runs on full vector lanes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import Splats

# packed payload column layout (16 f32 per splat)
#  0: mean2d.x  1: mean2d.y  2: conic.a  3: conic.b  4: conic.c
#  5: alpha     6: color.r   7: color.g  8: color.b  9: depth  10-15: pad
PAYLOAD_COLS = 16


class TileBins(NamedTuple):
    payload: jnp.ndarray  # (num_tiles, K, PAYLOAD_COLS); alpha=0 on padding


def pack_payload(splats: Splats) -> jnp.ndarray:
    n = splats.mean2d.shape[0]
    cols = [
        splats.mean2d[:, 0], splats.mean2d[:, 1],
        splats.conic[:, 0], splats.conic[:, 1], splats.conic[:, 2],
        splats.alpha,
        splats.color[:, 0], splats.color[:, 1], splats.color[:, 2],
        splats.depth,
    ]
    out = jnp.stack(cols + [jnp.zeros((n,), jnp.float32)] * (PAYLOAD_COLS - len(cols)),
                    axis=-1)
    return out


# ---------------------------------------------------------------------------
# packed row gather
#
# The (tiles*K)-row payload gather is ROW-ISSUE bound on TPU, not bandwidth
# bound: gathering 131k rows costs ~2.7 ms with (16,)-f32 rows but ~1.0 ms
# with 32-byte rows, independent of element count (measured in
# tools/jobs/016_binning_variants). So the hot path packs each splat into
# EIGHT f32 words — mx, my, conic a/b/c, depth exact; (alpha,r) and (g,b) as
# bitcast bf16 pairs — gathers the (N, 8) table, and unpacks back to the
# 16-column payload layout. Only alpha and color pay bf16 rounding (~0.4%
# relative, ~0.004 absolute on [0,1] colors).
#
# The pack/unpack goes through integer bitcasts, which have no VJP, so the
# whole pack->gather->unpack is one custom_vjp whose backward is the exact
# adjoint of the plain f32 row gather (a row scatter-add) — gradients are
# identical to the unpacked path up to the forward's bf16 rounding.
# ---------------------------------------------------------------------------

def _pack2(a, b):
    """Two f32 -> one f32 word holding (bf16(a) << 16) | bf16(b)."""
    ha = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    hb = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((ha << 16) | hb, jnp.float32)


def _unpack2(w):
    u = jax.lax.bitcast_convert_type(w, jnp.uint32)
    a = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(
        (u & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return a, b


def _pack_words(payload: jnp.ndarray) -> jnp.ndarray:
    """(N, 16) f32 payload -> (N, 8) f32 words (32-byte gather rows)."""
    p = payload
    return jnp.stack(
        [
            p[:, 0], p[:, 1], p[:, 2], p[:, 3], p[:, 4], p[:, 9],
            _pack2(p[:, 5], p[:, 6]), _pack2(p[:, 7], p[:, 8]),
        ],
        axis=-1,
    )


def _unpack_words(rows: jnp.ndarray) -> jnp.ndarray:
    """(..., 8) f32 words -> (..., 16) f32 payload layout."""
    alpha, r = _unpack2(rows[..., 6])
    g, b = _unpack2(rows[..., 7])
    pad = jnp.zeros_like(rows[..., 0])
    return jnp.stack(
        [
            rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3],
            rows[..., 4], alpha, r, g, b, rows[..., 5],
            pad, pad, pad, pad, pad, pad,
        ],
        axis=-1,
    )


@jax.custom_vjp
def packed_row_gather(payload: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """payload (N, 16) f32, ids (T, K) int32 -> (T, K, 16) f32 rows."""
    return _unpack_words(_pack_words(payload)[ids])


def _prg_fwd(payload, ids):
    return packed_row_gather(payload, ids), (ids, payload.shape[0])


def _prg_bwd(res, g):
    ids, n = res
    c = g.shape[-1]
    gp = jnp.zeros((n, c), g.dtype).at[ids.reshape(-1)].add(
        g.reshape(-1, c), mode="drop"
    )
    return gp, jnp.zeros(ids.shape, jax.dtypes.float0)


packed_row_gather.defvjp(_prg_fwd, _prg_bwd)


def bin_splats(
    splats: Splats,
    image_shape: tuple,
    tile_px: int,
    dup_hw: tuple,
    max_per_tile: int,
    packed_gather: bool = False,
) -> TileBins:
    H, W = image_shape
    th = -(-H // tile_px)
    tw = -(-W // tile_px)
    num_tiles = th * tw
    # tile-id bits sized to the tile count (values 0..num_tiles, the last
    # being the cull sentinel); the rest of the u32 key holds depth bits.
    # 256x256/16px -> 9 tile bits / 23 depth bits; 1024x1024/16px -> 13/19.
    tile_bits = (num_tiles + 1).bit_length()
    depth_shift = 32 - tile_bits
    assert depth_shift >= 16, (
        f"{num_tiles} tiles leave only {depth_shift} depth bits; raise "
        f"tile_px for this resolution"
    )
    n = splats.mean2d.shape[0]
    KH, KW = dup_hw

    mx, my = splats.mean2d[:, 0], splats.mean2d[:, 1]
    r = splats.radius
    live = r > 0

    inv_t = 1.0 / tile_px
    tx0 = jnp.clip(jnp.floor((mx - r) * inv_t), 0, tw - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mx + r) * inv_t), 0, tw - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((my - r) * inv_t), 0, th - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((my + r) * inv_t), 0, th - 1).astype(jnp.int32)

    # window of at most KH x KW tiles, centered on the splat's rect
    ctx = jnp.clip(jnp.floor(mx * inv_t), 0, tw - 1).astype(jnp.int32)
    cty = jnp.clip(jnp.floor(my * inv_t), 0, th - 1).astype(jnp.int32)
    wx0 = jnp.clip(ctx - (KW - 1) // 2, tx0, jnp.maximum(tx1 - KW + 1, tx0))
    wy0 = jnp.clip(cty - (KH - 1) // 2, ty0, jnp.maximum(ty1 - KH + 1, ty0))

    # depth bits: positive floats compare identically as unsigned ints;
    # dropping the low mantissa bits keeps front-to-back order to ~1e-5
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(splats.depth, 1e-6).astype(jnp.float32), jnp.uint32
    ) >> (32 - depth_shift)
    sentinel = jnp.uint32(num_tiles) << depth_shift

    # (slot, N) layout: each of the KH*KW window slots is a full-lane (N,) op
    keys = []
    for dy in range(KH):
        for dx in range(KW):
            tyy = wy0 + dy
            txx = wx0 + dx
            ok = (tyy <= ty1) & (txx <= tx1) & live
            tile = (tyy * tw + txx).astype(jnp.uint32)
            keys.append(
                jnp.where(ok, (tile << depth_shift) | depth_bits, sentinel)
            )
    key = jnp.concatenate(keys)  # (kdup * N,)
    gauss_idx = jnp.tile(jnp.arange(n, dtype=jnp.int32), KH * KW)

    # is_stable=False: a stable sort makes XLA sort a third (iota) array as
    # tiebreaker — the device profile showed the 2-operand sort costing
    # 3.6 ms/view with 3 result arrays (tools/jobs/056). Equal keys are the
    # same (tile, depth-bucket); their relative order is irrelevant to
    # compositing, exactly like the reference's unstable CUDA radix pairs.
    sorted_key, sorted_idx = jax.lax.sort(
        (key, gauss_idx), num_keys=1, is_stable=False
    )

    tile_starts_keys = jnp.arange(num_tiles, dtype=jnp.uint32) << depth_shift
    starts = jnp.searchsorted(sorted_key, tile_starts_keys, side="left")
    ends = jnp.searchsorted(
        sorted_key,
        tile_starts_keys + (jnp.uint32(1) << depth_shift),
        side="left",
    )

    k = jnp.arange(max_per_tile, dtype=jnp.int32)
    # per-tile front-K ids are CONTIGUOUS runs of sorted_idx — a (K,)-sized
    # slice per tile, far cheaper than 131k random single-element gathers.
    # dynamic_slice clamps its start so the window fits; windows shifted back
    # that way cover positions before the tile's segment, so validity is
    # checked against the true [starts, ends) range of each position.
    L = n * KH * KW
    if L < max_per_tile:
        # tiny scene: fewer candidate (splat, window-slot) pairs than the
        # per-tile capacity — dynamic_slice would need a window larger than
        # the array. Pad with dead entries (idx 0); slot_valid already
        # zeroes them since pos >= ends for padded positions.
        sorted_idx = jnp.pad(sorted_idx, (0, max_per_tile - L))
        L = max_per_tile
    starts_i = jnp.minimum(starts.astype(jnp.int32), L - max_per_tile)
    pos = starts_i[:, None] + k[None, :]
    slot_valid = (pos >= starts[:, None].astype(jnp.int32)) & (
        pos < ends[:, None].astype(jnp.int32)
    )
    ids = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(sorted_idx, s, max_per_tile)
    )(starts_i)  # (num_tiles, K)

    table = pack_payload(splats)  # (N, 16) f32
    if packed_gather:
        payload = packed_row_gather(table, ids)  # 32-byte-row gather (~2.7x)
    else:
        payload = table[ids]  # exact f32 row gather: (num_tiles, K, 16)
    payload = payload.at[..., 5].multiply(slot_valid.astype(jnp.float32))
    return TileBins(payload=payload)


# ---------------------------------------------------------------------------
# origin binning: sort N instead of N*KH*KW
#
# The dup-sort path above pays for a pair sort of N*KH*KW entries (2.1M for
# the flagship scene, 2.36 ms/view) because every splat is duplicated into
# each window slot BEFORE the sort. The origin path sorts each splat ONCE,
# keyed by its window-ORIGIN tile (the top-left tile of its KHxKW window):
#
#   1. pair sort of N (u32 origin|depth, u32 validbits|idx) — 1.11 ms at
#      524k, less than half the duplicated sort. The valid-bitmap (bit
#      dy*KW+dx set iff window slot (dy,dx) lands inside the splat's
#      3-sigma rect) rides in the high bits of the index word.
#   2. per-origin segments are contiguous slices of the sorted arrays,
#      exactly like the dup path's per-tile segments.
#   3. tile t's candidates are the KH*KW neighbor segments with origin
#      t-(dy,dx); per-candidate validity for THIS tile is bit (dy,dx) of
#      the bitmap. Invalid candidates get a sentinel depth key.
#   4. the merged candidate list is depth-ordered by an in-graph BITONIC
#      sorting network on a single u32 (depth | candidate-slot) word —
#      pure reshape/min/max stages, no lax.sort, no gathers — and the
#      front-K survivors index the payload table as before.
#
# Approximations vs the dup path (both directions are caps, reported by
# coverage_stats): per-ORIGIN segments are capped at K entries before the
# merge (the dup path caps per-tile after), and depth keys carry
# 32 - log2(KH*KW*K) bits instead of 32 - tile_bits (21 vs 23 for the
# flagship config — ties share a 4e-5-relative depth bucket; tie order is
# arbitrary in both paths, like the reference's unstable CUDA radix sort).
# ---------------------------------------------------------------------------


def _bitonic_sort_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Ascending bitonic sort along the last axis (power-of-two length).

    Expressed as reshape + min/max compare-exchange stages so XLA lowers to
    fused elementwise kernels (no gather/scatter, no lax.sort).
    """
    t, m = x.shape
    assert m & (m - 1) == 0, f"bitonic length {m} not a power of two"
    k = 2
    while k <= m:
        j = k // 2
        while j >= 1:
            g = m // (2 * j)
            xr = x.reshape(t, g, 2, j)
            lo, hi = xr[:, :, 0], xr[:, :, 1]
            # subsequence of size k ascending iff its k-block index is even
            asc = (jnp.arange(g) * 2 * j & k) == 0
            asc = asc[None, :, None]
            swap = jnp.where(asc, lo > hi, lo < hi)
            nlo = jnp.where(swap, hi, lo)
            nhi = jnp.where(swap, lo, hi)
            x = jnp.stack([nlo, nhi], axis=2).reshape(t, m)
            j //= 2
        k *= 2
    return x


def bin_splats_origin(
    splats: Splats,
    image_shape: tuple,
    tile_px: int,
    dup_hw: tuple,
    max_per_tile: int,
    packed_gather: bool = False,
) -> TileBins:
    """Origin-binned equivalent of `bin_splats` (same TileBins contract)."""
    H, W = image_shape
    th = -(-H // tile_px)
    tw = -(-W // tile_px)
    num_tiles = th * tw
    tile_bits = (num_tiles + 1).bit_length()
    depth_shift = 32 - tile_bits
    assert depth_shift >= 16
    n = splats.mean2d.shape[0]
    KH, KW = dup_hw
    n_slots = KH * KW
    idx_bits = max(n - 1, 1).bit_length()
    assert idx_bits + n_slots <= 32, (
        f"{n} splats x {n_slots} window slots don't fit a packed u32 index"
    )

    mx, my = splats.mean2d[:, 0], splats.mean2d[:, 1]
    r = splats.radius
    live = r > 0
    inv_t = 1.0 / tile_px
    tx0 = jnp.clip(jnp.floor((mx - r) * inv_t), 0, tw - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mx + r) * inv_t), 0, tw - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((my - r) * inv_t), 0, th - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((my + r) * inv_t), 0, th - 1).astype(jnp.int32)
    ctx = jnp.clip(jnp.floor(mx * inv_t), 0, tw - 1).astype(jnp.int32)
    cty = jnp.clip(jnp.floor(my * inv_t), 0, th - 1).astype(jnp.int32)
    wx0 = jnp.clip(ctx - (KW - 1) // 2, tx0, jnp.maximum(tx1 - KW + 1, tx0))
    wy0 = jnp.clip(cty - (KH - 1) // 2, ty0, jnp.maximum(ty1 - KH + 1, ty0))

    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(splats.depth, 1e-6).astype(jnp.float32), jnp.uint32
    ) >> (32 - depth_shift)

    valid_bits = jnp.zeros((n,), jnp.uint32)
    for dy in range(KH):
        for dx in range(KW):
            ok = (wy0 + dy <= ty1) & (wx0 + dx <= tx1) & live
            valid_bits = valid_bits | (
                ok.astype(jnp.uint32) << jnp.uint32(dy * KW + dx)
            )
    origin = (wy0 * tw + wx0).astype(jnp.uint32)
    sentinel = jnp.uint32(num_tiles) << depth_shift
    key = jnp.where(
        valid_bits > 0, (origin << depth_shift) | depth_bits, sentinel
    )
    pidx = (valid_bits << jnp.uint32(idx_bits)) | jnp.arange(n, dtype=jnp.uint32)

    sorted_key, sorted_pidx = jax.lax.sort(
        (key, pidx), num_keys=1, is_stable=False
    )

    tile_starts_keys = jnp.arange(num_tiles, dtype=jnp.uint32) << depth_shift
    starts = jnp.searchsorted(sorted_key, tile_starts_keys, side="left")
    ends = jnp.searchsorted(
        sorted_key,
        tile_starts_keys + (jnp.uint32(1) << depth_shift),
        side="left",
    )

    S = max_per_tile
    L = n
    if L < S:
        sorted_key = jnp.pad(sorted_key, (0, S - L),
                             constant_values=jnp.uint32(0xFFFFFFFF))
        sorted_pidx = jnp.pad(sorted_pidx, (0, S - L))
        L = S
    starts_i = jnp.minimum(starts.astype(jnp.int32), L - S)
    pos = starts_i[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    in_seg = (pos >= starts[:, None].astype(jnp.int32)) & (
        pos < ends[:, None].astype(jnp.int32)
    )
    seg_key = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(sorted_key, s, S)
    )(starts_i)   # (num_tiles, S)
    seg_pidx = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(sorted_pidx, s, S)
    )(starts_i)

    # merged candidate width, padded to a power of two for the bitonic net
    m = 1 << (n_slots * S - 1).bit_length()
    slot_bits = m.bit_length() - 1  # log2(m)
    # depth bits kept in the merged word (top of the original depth field)
    dkeep = 32 - slot_bits
    seg_depth = (seg_key << jnp.uint32(tile_bits)) >> jnp.uint32(32 - dkeep)
    idx_mask = jnp.uint32((1 << idx_bits) - 1)

    t_idx = jnp.arange(num_tiles, dtype=jnp.int32)
    tyy, txx = t_idx // tw, t_idx % tw
    cand_words = []
    cand_ids = []
    full = jnp.uint32(0xFFFFFFFF)
    for dy in range(KH):
        for dx in range(KW):
            oy, ox = tyy - dy, txx - dx
            in_grid = (oy >= 0) & (ox >= 0)
            o = jnp.clip(oy, 0) * tw + jnp.clip(ox, 0)
            k_o = seg_depth[o]        # (num_tiles, S) row gather, 256 rows
            p_o = seg_pidx[o]
            ok = (
                in_grid[:, None]
                & in_seg[o]
                & ((p_o >> jnp.uint32(idx_bits + dy * KW + dx))
                   & jnp.uint32(1) > 0)
            )
            slot0 = len(cand_words) * S
            slot_word = (slot0 + jnp.arange(S, dtype=jnp.uint32))[None, :]
            cand_words.append(jnp.where(
                ok, (k_o << jnp.uint32(slot_bits)) | slot_word, full
            ))
            cand_ids.append((p_o & idx_mask).astype(jnp.int32))
    cand = jnp.concatenate(cand_words, axis=1)   # (num_tiles, n_slots*S)
    cand_id = jnp.concatenate(cand_ids, axis=1)
    if cand.shape[1] < m:
        cand = jnp.pad(cand, ((0, 0), (0, m - cand.shape[1])),
                       constant_values=full)

    if jax.default_backend() == "cpu":
        merged = _bitonic_sort_u32(cand)[:, :max_per_tile]
    else:
        # the same network as a single VMEM-resident pallas kernel — the
        # XLA chain re-streams the candidate array from HBM every stage
        # (~1.2 ms/view, tools/jobs/078); in VMEM it is ~0.1 ms
        from .pallas_bitonic import bitonic_topk_u32

        merged = bitonic_topk_u32(cand, max_per_tile)
    slot_valid = merged != full
    slot = (merged & jnp.uint32(m - 1)).astype(jnp.int32)
    ids = jnp.take_along_axis(
        cand_id, jnp.minimum(slot, cand_id.shape[1] - 1), axis=1
    )  # (num_tiles, K)

    table = pack_payload(splats)
    if packed_gather:
        payload = packed_row_gather(table, ids)
    else:
        payload = table[ids]
    payload = payload.at[..., 5].multiply(slot_valid.astype(jnp.float32))
    return TileBins(payload=payload)


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


def _composite_group(payload: jnp.ndarray, pix: jnp.ndarray, chunk: int):
    """Composite one group of tiles. payload: (T, K, 16); pix: (T, P, 2).
    Returns rgb (T,P,3), depth (T,P), alpha-sum (T,P), final transmittance."""
    T_, K, _ = payload.shape
    P = pix.shape[1]
    n_chunks = K // chunk
    assert n_chunks * chunk == K, "max_per_tile must be a multiple of chunk"

    # strictly-upper-triangular ones: exclusive prefix via matmul
    tri = jnp.triu(jnp.ones((chunk, chunk), jnp.float32), k=1)

    def chunk_step(carry, idx):
        # carry: log-transmittance (T, P) and a FUSED (T, P, 4) rgb+depth
        # accumulator — accumulating rgb (.., 3) and depth separately makes
        # XLA carry a 3-wide-trailing array whose adds cost ~5 ms/12 views
        # in padded (4,128) tiles (device profile, tools/jobs/059)
        log_t, rgbd, asum = carry
        pl = jax.lax.dynamic_slice_in_dim(payload, idx * chunk, chunk, axis=1)
        mx, my = pl[..., 0], pl[..., 1]
        ca, cb, cc = pl[..., 2], pl[..., 3], pl[..., 4]
        alp = pl[..., 5]

        dx = pix[:, :, None, 0] - mx[:, None, :]  # (T, P, G)
        dy = pix[:, :, None, 1] - my[:, None, :]
        power = (
            -0.5 * (ca[:, None, :] * dx * dx + cc[:, None, :] * dy * dy)
            - cb[:, None, :] * dx * dy
        )
        a = jnp.minimum(0.99, alp[:, None, :] * jnp.exp(jnp.minimum(power, 0.0)))
        a = jnp.where((power > 0.0) | (a < 1.0 / 255.0), 0.0, a)

        logom = jnp.log1p(-a)  # (T, P, G)
        prefix = jnp.einsum("tpg,gh->tph", logom, tri)
        w = jnp.exp(log_t[:, :, None] + prefix) * a  # blending weights

        feats = pl[..., 6:10]  # (T, G, 4): rgb + depth
        rgbd = rgbd + jnp.einsum("tpg,tgf->tpf", w, feats)
        asum = asum + w.sum(-1)
        log_t = log_t + logom.sum(-1)
        return (log_t, rgbd, asum), None

    init = (
        jnp.zeros((T_, P), jnp.float32),
        jnp.zeros((T_, P, 4), jnp.float32),
        jnp.zeros((T_, P), jnp.float32),
    )
    (log_t, rgbd, asum), _ = jax.lax.scan(
        jax.checkpoint(chunk_step), init, jnp.arange(n_chunks)
    )
    return rgbd[..., :3], rgbd[..., 3], asum, jnp.exp(log_t)


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
    # small max_per_tile (adaptive caps can pick K=128 < the default
    # chunk=256): composite in one chunk instead of asserting
    chunk = min(chunk, bins.payload.shape[1])

    # clamp the grouping to a divisor of the tile count (small images have
    # fewer tiles than the default group size)
    tile_group = min(tile_group, num_tiles)
    while num_tiles % tile_group:
        tile_group -= 1
    n_groups = num_tiles // tile_group

    def group_fn(gi):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, gi * tile_group, tile_group, 0)
        return _composite_group(sl(bins.payload), sl(pix), chunk)

    rgb, dep, asum, t_final = jax.lax.map(group_fn, jnp.arange(n_groups))
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
