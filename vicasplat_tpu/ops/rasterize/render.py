"""Public differentiable rendering API.

`render` is the TPU equivalent of the reference's `render_cuda` /
`render_gsplat` (reference: src/model/decoder/cuda_splatting.py:148-239,
47-145): batched views, RGB + expected depth + alpha, gradients to all
Gaussian parameters and (via optional SE(3) deltas on the view matrix) to
camera pose — matching the `theta`/`rho` pose-gradient contract of
diff-gaussian-rasterization-w-pose.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ...geometry.se3 import rigid_inverse, se3_exp
from .projection import project_gaussians
from .tiles import bin_splats, bin_splats_origin, composite_tiles


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    tile_px: int = 16
    dup_hw: tuple = (2, 2)       # max tiles a splat may cover (centered window)
    max_per_tile: int = 512      # front-most splats kept per tile
    chunk: int = 256             # compositing chunk (matmul G dim)
    tile_group: int = 64         # tiles composited together per map step
    # 32-byte packed payload rows for the binning gather. In microbenchmarks
    # 32-byte rows gather ~2.7x faster than 64-byte f32 rows, but in the full
    # render XLA's fusion already hides the difference (measured equal,
    # tools/jobs/022), so the exact-f32 path stays the default; the packed
    # path (alpha/color rounded to bf16) remains available and tested.
    packed_gather: bool = False
    # "xla": pure-XLA matmul compositing — the production default.
    # "pallas": fused per-tile SoA kernel with early termination (forward;
    # the backward rematerializes through the XLA path — gradients match).
    # "auto": pallas on accelerators, xla on CPU (resolved at trace time).
    # The SoA kernel wins in isolation (0.424 ms vs 0.855 ms on the
    # production 256-tile K=512 payload, bit-identical output,
    # tools/jobs/068b) but LOSES end-to-end (12-view render 52.98 vs
    # 52.09 ms, e2e 100.3 vs 97.7 ms, tools/jobs/070): the pallas_call
    # boundary forces the binning gather's output to materialize in HBM
    # (+an AoS->SoA transpose), while XLA fuses the gather epilogue into
    # its composite. Kept as a validated exact alternate backend.
    backend: str = "xla"
    # compositing chunk for the pallas kernel; smaller chunks exit earlier
    # on saturated tiles (128 beat 256 by 11% on the flagship payload)
    pallas_chunk: int = 128
    # "dup_sort": duplicate each splat into its KHxKW window slots, one
    # global (tile|depth, idx) pair sort of N*KH*KW entries.
    # "origin": sort N entries keyed by window-ORIGIN tile, then depth-merge
    # each tile's KH*KW neighbor segments with an in-graph bitonic network
    # (tiles.bin_splats_origin) — less than half the lax.sort volume.
    binning: str = "dup_sort"
    # Unroll the per-view loop at trace time instead of lax.map. Gives XLA
    # the whole multi-view graph to schedule (cross-view DMA/compute overlap
    # a rolled loop body can't express) at the cost of V x compile time and
    # V x the binning live range. Opt-in; measured in tools/jobs round 5.
    unroll_views: bool = False


def render_view(
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    harmonics: jnp.ndarray,
    opacities: jnp.ndarray,
    viewmat: jnp.ndarray,      # (4, 4) w2c
    intrinsics: jnp.ndarray,   # (3, 3) normalized
    image_shape: tuple,
    background: jnp.ndarray,   # (3,)
    sh_degree: int,
    near: float = 0.2,
    cfg: RasterizeConfig = RasterizeConfig(),
    cov6: Optional[jnp.ndarray] = None,
):
    splats = project_gaussians(
        means, covariances, harmonics, opacities, viewmat, intrinsics,
        image_shape, sh_degree, near=near, cov6=cov6,
    )
    bin_fn = bin_splats_origin if cfg.binning == "origin" else bin_splats
    bins = bin_fn(splats, image_shape, cfg.tile_px, cfg.dup_hw,
                  cfg.max_per_tile, packed_gather=cfg.packed_gather)
    backend = cfg.backend
    if backend == "auto":
        # resolved at trace time: the fused kernel on accelerators, the
        # pure-XLA path on CPU (where pallas would run interpreted and the
        # XLA matmul path is the fast one)
        backend = "xla" if jax.default_backend() == "cpu" else "pallas"
    if backend == "pallas" and isinstance(background, jax.core.Tracer):
        # the kernel needs the background as a static tuple; callers that
        # trace it (e.g. a learnable background) keep the XLA path
        backend = "xla"
    if backend == "pallas":
        from .pallas_composite import composite_tiles_pallas

        bg = tuple(float(x) for x in background) if not isinstance(
            background, tuple
        ) else background
        chunk = min(cfg.pallas_chunk, cfg.max_per_tile)
        return composite_tiles_pallas(
            bins, tuple(image_shape), cfg.tile_px, bg, chunk
        )
    return composite_tiles(
        bins, image_shape, cfg.tile_px, jnp.asarray(background, jnp.float32),
        chunk=cfg.chunk, tile_group=cfg.tile_group,
    )


def coverage_stats(
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    harmonics: jnp.ndarray,
    opacities: jnp.ndarray,
    viewmat: jnp.ndarray,
    intrinsics: jnp.ndarray,
    image_shape: tuple,
    sh_degree: int,
    cfg: RasterizeConfig = RasterizeConfig(),
) -> dict:
    """Diagnose the static-shape approximations for one view.

    The reference's CUDA rasterizer emits one entry per overlapped tile with
    no bound; this pipeline caps a splat's duplication window at
    `cfg.dup_hw` tiles (centered on its 3-sigma rect) and keeps the
    front-most `cfg.max_per_tile` entries per tile. Returns the fraction of
    live splats whose 3-sigma rect exceeds the window (`truncated_frac` —
    raise dup_hw if it is non-negligible) and the fraction of tiles whose
    entry list overflows K (`tile_overflow_frac` — raise max_per_tile).
    """
    from .tiles import bin_splats

    splats = project_gaussians(
        means, covariances, harmonics, opacities, viewmat, intrinsics,
        image_shape, sh_degree,
    )
    KH, KW = cfg.dup_hw
    live = splats.radius > 0
    tiles_w = 2.0 * splats.radius / cfg.tile_px + 1.0  # max tiles spanned
    truncated = live & ((tiles_w > KW) | (tiles_w > KH))
    bins = bin_splats(splats, image_shape, cfg.tile_px, cfg.dup_hw,
                      cfg.max_per_tile, packed_gather=False)
    occupancy = (bins.payload[..., 5] > 0).sum(axis=1)
    n_live = jnp.maximum(live.sum(), 1)
    return {
        "live_frac": live.mean(),
        "truncated_frac": truncated.sum() / n_live,
        "tile_occupancy_mean": occupancy.mean(),
        "tile_overflow_frac": (occupancy >= cfg.max_per_tile).mean(),
    }


def select_raster_config(
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    harmonics: jnp.ndarray,
    opacities: jnp.ndarray,
    viewmat: jnp.ndarray,
    intrinsics: jnp.ndarray,
    image_shape: tuple,
    sh_degree: int,
    base: RasterizeConfig = RasterizeConfig(),
    dup_choices: tuple = (2, 3, 4, 6),
    k_choices: tuple = (256, 512, 1024, 2048),
    coverage_q: float = 0.99,
    headroom: float = 1.1,
) -> RasterizeConfig:
    """Choose scene-adaptive static caps (dup_hw, max_per_tile).

    The CUDA reference has no caps — per-tile lists are unbounded
    (reference src/model/decoder/cuda_splatting.py:148-239, atomics in the
    external rasterizer). A TPU kernel needs static shapes, so instead the
    caps ESCALATE per scene: probe one view (projection + one binning pass
    at the largest candidate caps), then pick the smallest `dup_hw` whose
    window covers the `coverage_q` quantile of live splats' tile spans and
    the smallest `max_per_tile` above the `coverage_q` occupancy quantile
    (x `headroom`). Shape-cached consumers (serving.InferenceEngine with
    adaptive_caps=True) recompile once per selected config. Thresholds are
    backed by the caps-vs-bruteforce error table
    (outputs/rasterizer_caps/caps_study_synthetic.json).
    """
    from .tiles import bin_splats

    dup_max = max(dup_choices)
    k_max = max(k_choices)

    def probe():
        splats = project_gaussians(
            means, covariances, harmonics, opacities, viewmat, intrinsics,
            image_shape, sh_degree,
        )
        live = splats.radius > 0
        tiles_w = 2.0 * splats.radius / base.tile_px + 1.0
        # quantile over LIVE splats only: dead ones (radius 0) span 1 tile
        # and would dilute the tail the window must cover
        span_sorted = jnp.sort(jnp.where(live, tiles_w, 0.0))
        n_live = jnp.maximum(live.sum(), 1)
        n = span_sorted.shape[0]
        q_idx = jnp.clip(
            n - n_live + (coverage_q * (n_live - 1)).astype(jnp.int32), 0,
            n - 1,
        )
        span_q = span_sorted[q_idx]
        bins = bin_splats(splats, image_shape, base.tile_px,
                          (dup_max, dup_max), k_max, packed_gather=False)
        occ = (bins.payload[..., 5] > 0).sum(axis=1)
        occ_q = jnp.quantile(occ.astype(jnp.float32), coverage_q)
        return span_q, occ_q

    span_q, occ_q = jax.jit(probe)()
    span_q, occ_q = float(span_q), float(occ_q)
    dup = max(base.dup_hw)
    if span_q > dup:  # escalate only when the base window truncates
        dup = next((d for d in sorted(dup_choices) if d >= span_q), dup_max)
    k = base.max_per_tile
    k_need = occ_q * headroom
    if k_need > k:  # escalate only when the base K overflows
        k = next((c for c in sorted(k_choices) if c >= k_need), k_max)
    return dataclasses.replace(base, dup_hw=(dup, dup), max_per_tile=k)


def render(
    means: jnp.ndarray,         # (N, 3)
    covariances: jnp.ndarray,   # (N, 3, 3)
    harmonics: jnp.ndarray,     # (N, 3, d_sh)
    opacities: jnp.ndarray,     # (N,)
    extrinsics: jnp.ndarray,    # (V, 4, 4) c2w
    intrinsics: jnp.ndarray,    # (V, 3, 3) normalized
    image_shape: tuple,
    background: jnp.ndarray,    # (3,)
    sh_degree: int,
    near: float | jnp.ndarray = 0.2,
    cam_rot_delta: Optional[jnp.ndarray] = None,    # (V, 3)
    cam_trans_delta: Optional[jnp.ndarray] = None,  # (V, 3)
    cfg: RasterizeConfig = RasterizeConfig(),
    cov6: Optional[jnp.ndarray] = None,  # (N, 6) packed world covariance
):
    """Render V views of one Gaussian scene.

    Returns (color (V,H,W,3), depth (V,H,W), alpha (V,H,W)). Views are
    mapped sequentially (lax.map) to bound binning memory; the per-view body
    is internally batched/MXU-heavy so sequential views lose no utilization.
    """
    viewmats = rigid_inverse(extrinsics)
    if cam_rot_delta is not None or cam_trans_delta is not None:
        v = extrinsics.shape[0]
        rot = cam_rot_delta if cam_rot_delta is not None else jnp.zeros((v, 3))
        tra = cam_trans_delta if cam_trans_delta is not None else jnp.zeros((v, 3))
        tau = jnp.concatenate([tra, rot], axis=-1)
        viewmats = se3_exp(tau) @ viewmats  # left-multiplied retraction on w2c

    # Views run fully sequential (lax.map), projection INSIDE the body:
    # batching projection across views (vmap) regressed the 12-view render
    # 83 -> 99 ms — materializing (V, N) splat arrays in HBM costs more than
    # the fused-per-view recompute (tools/jobs/035). vmapping the whole body
    # was 2x slower still (round 1).
    # view-independent packed covariance, hoisted out of the per-view map
    # (see project_gaussians cov6); callers with scales/rotations at hand
    # should pass cov6=cov6_from_scale_rot(...) and never materialize the
    # badly-tiling (N, 3, 3) form
    if cov6 is None:
        cov6 = jnp.stack(
            [covariances[:, 0, 0], covariances[:, 0, 1], covariances[:, 0, 2],
             covariances[:, 1, 1], covariances[:, 1, 2], covariances[:, 2, 2]],
            axis=-1,
        )

    def body(args):
        vm, K = args
        return render_view(
            means, covariances, harmonics, opacities, vm, K,
            image_shape, background, sh_degree, near=near, cfg=cfg,
            cov6=cov6,
        )

    if cfg.unroll_views:
        outs = [body((viewmats[v], intrinsics[v]))
                for v in range(viewmats.shape[0])]
        color, depth, alpha = (jnp.stack([o[i] for o in outs])
                               for i in range(3))
    else:
        color, depth, alpha = jax.lax.map(body, (viewmats, intrinsics))
    return color, depth, alpha
