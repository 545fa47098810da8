"""Rendering decoder: Gaussians + target cameras -> images/depths.

Parity target: reference src/model/decoder/decoder_splatting_cuda.py:23-101
(flattening of (b, v, h, w)-shaped pixel-aligned Gaussians, optional
scale-invariant rescaling, per-view rendering, DecoderOutput(color, depth)).
On TPU the renderer is ops.rasterize.render; batches are mapped with lax.map
and views handled inside.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.adapter import Gaussians
from ..ops.rasterize import RasterizeConfig, render


@dataclasses.dataclass(frozen=True)
class DecoderSplattingConfig:
    background_color: tuple = (0.0, 0.0, 0.0)
    make_scale_invariant: bool = False
    rasterize: RasterizeConfig = RasterizeConfig()
    # serving-time splat pruning: drop this fraction of lowest-opacity
    # Gaussians (one static top_k) before the per-view pipeline. The render
    # is sort-bound (DESIGN.md §7), and sort/bin/composite all scale with N,
    # so pruning trades fidelity for throughput across ALL views at once.
    # Exact when the dropped splats are fully transparent; opt-in otherwise
    # (0.0 = off, the parity default).
    prune_fraction: float = 0.0


class DecoderOutput(NamedTuple):
    color: jnp.ndarray  # (B, V, H, W, 3)
    depth: jnp.ndarray  # (B, V, H, W)
    alpha: jnp.ndarray  # (B, V, H, W)


def flatten_gaussians(g: Gaussians) -> Gaussians:
    """(B, T, H, W, ...) pixel-aligned Gaussians -> (B, N, ...)."""
    b = g.means.shape[0]
    flat = lambda x, extra: (
        None if x is None else x.reshape(b, -1, *x.shape[x.ndim - extra:])
    )
    return Gaussians(
        means=flat(g.means, 1),
        covariances=flat(g.covariances, 2),
        harmonics=flat(g.harmonics, 2),
        opacities=g.opacities.reshape(b, -1),
        scales=flat(g.scales, 1),
        rotations=flat(g.rotations, 1),
    )


def prune_gaussians(g: Gaussians, fraction: float) -> Gaussians:
    """Keep the top (1-fraction) of splats by opacity, per batch element.

    Survivor selection is a per-batch 1-D PAIR SORT by descending opacity
    plus a contiguous slice of the first `keep` indices — NOT `lax.top_k`:
    at serving fractions the kept count is a large share of N, and top_k
    with k ~ N is a full sort through a much slower code path (measured,
    tools/jobs/012: prune=0.25 made the 12-view render 48.6 -> 69 ms; a
    524k pair sort is 1.11 ms, tools/jobs/010). All downstream shapes stay
    static (the XLA requirement) and every per-view sort/bin/composite
    shrinks. Survivor order is irrelevant downstream — the rasterizer
    re-sorts by depth keys. Batched 2-D sorts are catastrophic on TPU
    (notes, jobs 010), so the B axis is a Python loop (B is 1-2 here).

    TPU gather note (measured, tools/jobs/079b): row gathers are row-ISSUE
    bound, ~2.7 ms per 131k rows regardless of row width — so gathering the
    six fields separately costs ~6x one gather and made pruning a net LOSS
    (12-view render 56 -> 110 ms at fraction=0.25). All fields are instead
    packed into ONE (B, N, C) matrix and gathered with a single row gather,
    then unpacked (the concat/split are contiguous-bandwidth ops, ~0.5 ms
    at 524k x ~95 f32).
    """
    N = g.opacities.shape[1]
    keep = max(1, int(round(N * (1.0 - fraction))))
    if N >= 256:  # keep the lane dimension aligned when there is room
        keep = max(128, (keep // 128) * 128)
    iota = jnp.arange(N, dtype=jnp.int32)
    idx = jnp.stack([
        jax.lax.sort((-g.opacities[b], iota), num_keys=1, is_stable=False)[1][
            :keep
        ]
        for b in range(g.opacities.shape[0])
    ])  # (B, keep)

    fields = [
        ("means", g.means), ("covariances", g.covariances),
        ("harmonics", g.harmonics), ("opacities", g.opacities[..., None]),
        ("scales", g.scales), ("rotations", g.rotations),
    ]
    b = g.opacities.shape[0]
    parts, spans = [], {}
    col = 0
    for name, x in fields:
        if x is None:
            spans[name] = None
            continue
        flat = x.reshape(b, N, -1)
        spans[name] = (col, col + flat.shape[-1], x.shape[2:])
        col += flat.shape[-1]
        parts.append(flat)
    packed = jnp.concatenate(parts, axis=-1)  # (B, N, C)
    kept = jnp.take_along_axis(packed, idx[..., None], axis=1)  # one gather

    def unpack(name):
        span = spans[name]
        if span is None:
            return None
        lo, hi, shape = span
        return kept[..., lo:hi].reshape(b, keep, *shape)

    return Gaussians(
        means=unpack("means"), covariances=unpack("covariances"),
        harmonics=unpack("harmonics"),
        opacities=unpack("opacities")[..., 0],
        scales=unpack("scales"), rotations=unpack("rotations"),
    )


def decoder_forward(
    cfg: DecoderSplattingConfig,
    gaussians: Gaussians,
    extrinsics: jnp.ndarray,   # (B, V, 4, 4) c2w
    intrinsics: jnp.ndarray,   # (B, V, 3, 3) normalized
    near: jnp.ndarray,         # (B, V)
    far: jnp.ndarray,          # (B, V)
    image_shape: tuple,
    cam_rot_delta: Optional[jnp.ndarray] = None,    # (B, V, 3)
    cam_trans_delta: Optional[jnp.ndarray] = None,  # (B, V, 3)
    sh_degree: Optional[int] = None,
) -> DecoderOutput:
    if gaussians.means.ndim > 3:
        gaussians = flatten_gaussians(gaussians)
    if cfg.prune_fraction > 0.0:
        gaussians = prune_gaussians(gaussians, cfg.prune_fraction)
    if sh_degree is None:
        sh_degree = int(round(gaussians.harmonics.shape[-1] ** 0.5)) - 1
    bg = tuple(float(c) for c in cfg.background_color)  # static for pallas

    if cfg.make_scale_invariant:
        scale = 1.0 / near[:, 0]  # (B,)
        extrinsics = extrinsics.at[..., :3, 3].multiply(scale[:, None, None])
        gaussians = gaussians._replace(means=gaussians.means * scale[:, None, None])
        near = near * scale[:, None]
        far = far * scale[:, None]

    # packed (B, N, 6) covariance. scales/rotations are the source of truth
    # (the adapter always fills them); recomputing cov6 from them beats
    # loading the (N, 3, 3) field, which tiles at ~42x its logical bytes on
    # TPU (projection.cov6_from_scale_rot). Gaussians built without
    # scales/rotations (e.g. loaded from a PLY with baked covariances) fall
    # back to packing the covariances field's upper triangle.
    from ..ops.rasterize.projection import cov6_from_scale_rot

    B = gaussians.means.shape[0]
    if gaussians.scales is None or gaussians.rotations is None:
        c = gaussians.covariances
        cov6 = jnp.stack(
            [c[..., 0, 0], c[..., 0, 1], c[..., 0, 2],
             c[..., 1, 1], c[..., 1, 2], c[..., 2, 2]], axis=-1)
    else:
        cov6 = jax.vmap(cov6_from_scale_rot)(gaussians.scales, gaussians.rotations)
    if cfg.make_scale_invariant:
        cov6 = cov6 * (scale[:, None, None] ** 2)

    def per_example(args):
        g_means, g_cov6, g_sh, g_op, ext, K, rot_d, trans_d = args
        return render(
            g_means, None, g_sh, g_op, ext, K, image_shape, bg, sh_degree,
            cam_rot_delta=rot_d, cam_trans_delta=trans_d, cfg=cfg.rasterize,
            cov6=g_cov6,
        )

    B, V = extrinsics.shape[:2]
    rot_d = cam_rot_delta if cam_rot_delta is not None else jnp.zeros((B, V, 3))
    trans_d = cam_trans_delta if cam_trans_delta is not None else jnp.zeros((B, V, 3))
    color, depth, alpha = jax.lax.map(
        per_example,
        (
            gaussians.means, cov6, gaussians.harmonics,
            gaussians.opacities, extrinsics, intrinsics, rot_d, trans_d,
        ),
    )
    return DecoderOutput(color, depth, alpha)


# coverage thresholds above which the static-shape caps (dup_hw tiles per
# splat, max_per_tile entries per tile) visibly distort a scene. The CUDA
# reference has no such caps (cuda_splatting.py:148-239 emits unbounded
# per-tile lists), so silent truncation is OUR correctness risk — surface it.
COVERAGE_TRUNCATED_WARN = 0.05
COVERAGE_OVERFLOW_WARN = 0.05


def coverage_report(
    cfg: DecoderSplattingConfig,
    gaussians: Gaussians,
    extrinsics: jnp.ndarray,   # (B, V, 4, 4) c2w
    intrinsics: jnp.ndarray,   # (B, V, 3, 3) normalized
    image_shape: tuple,
    view: int = 0,
    warn: bool = True,
    tag: str = "",
) -> dict:
    """Rasterizer coverage diagnostics for one (first-example) view.

    Returns ops.rasterize.coverage_stats as plain floats and, when
    `truncated_frac` / `tile_overflow_frac` exceed the warn thresholds,
    prints an actionable warning (raise dup_hw / max_per_tile)."""
    from ..geometry.se3 import rigid_inverse
    from ..ops.rasterize.render import coverage_stats

    if gaussians.means.ndim > 3:
        gaussians = flatten_gaussians(gaussians)
    sh_degree = int(round(gaussians.harmonics.shape[-1] ** 0.5)) - 1
    covs = gaussians.covariances
    if covs is None:
        from ..models.adapter import build_covariance

        covs = build_covariance(gaussians.scales, gaussians.rotations)
    stats = jax.jit(
        coverage_stats, static_argnames=("image_shape", "sh_degree", "cfg")
    )(
        gaussians.means[0], covs[0], gaussians.harmonics[0],
        gaussians.opacities[0], rigid_inverse(extrinsics[0, view]),
        intrinsics[0, view], image_shape=tuple(image_shape),
        sh_degree=sh_degree, cfg=cfg.rasterize,
    )
    stats = {k: float(v) for k, v in stats.items()}
    if warn:
        r = cfg.rasterize
        label = f" [{tag}]" if tag else ""
        if stats["truncated_frac"] > COVERAGE_TRUNCATED_WARN:
            print(
                f"WARNING{label}: {stats['truncated_frac']:.1%} of live "
                f"splats span more than the dup_hw={r.dup_hw} tile window "
                f"and are truncated; raise rasterize.dup_hw "
                f"(coverage_stats, no such cap exists in the CUDA reference)"
            )
        if stats["tile_overflow_frac"] > COVERAGE_OVERFLOW_WARN:
            print(
                f"WARNING{label}: {stats['tile_overflow_frac']:.1%} of tiles "
                f"hit the max_per_tile={r.max_per_tile} capacity; far splats "
                f"are dropped — raise rasterize.max_per_tile"
            )
    return stats
