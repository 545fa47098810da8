"""Live-splat render timing + coverage stats for the r3 decomposition.

Job 011 exposed two artifact problems:
  1. Sub-op timings went NEGATIVE (full_bin -2.1 ms): benchlib took the min
     of paired (long - base) differences, and the tunnel's one-sided ~50 ms
     jitter in a base run flips the sign. benchlib now differences the
     per-phase minima — re-time those entries.
  2. coverage_stats came out all-zero: the bench scene's gaussians come
     from a RANDOM-weight forward and every splat is frustum-culled
     (live_frac 0). The render ops are data-independent (fixed XLA sorting
     network, static-shape gathers/matmuls) so the timing should not care —
     but that claim must be MEASURED, and coverage stats are only
     meaningful on visible geometry.

This job builds a fully-visible synthetic 524k scene (pixel-grid
unprojection at depths 1-8, few-pixel radii), times render_12v/render_view
on it next to the culled bench scene, recomputes coverage there, and
rewrites outputs/perf_decomposition/decomp_r3.json clean.
"""
import sys

for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib", "bench")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from benchlib import device_time, sync

from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig,
    init_vicasplat, vicasplat_forward,
)
from vicasplat_tpu.ops.rasterize.projection import project_gaussians, cov6_from_scale_rot
from vicasplat_tpu.ops.rasterize import tiles as TL
from vicasplat_tpu.ops.rasterize.render import (
    render, render_view, coverage_stats, RasterizeConfig,
)
from vicasplat_tpu.ops.rasterize.tiles import composite_tiles, TileBins

results = {}


def tm(name, fn, *args, iters=20, base=2, repeats=3):
    try:
        t = device_time(fn, *args, iters=iters, base=base, repeats=repeats)
    except Exception as e:
        print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    results[name + "_ms"] = round(t * 1e3, 3)
    print(f"{name:22s} {t*1e3:8.2f} ms", flush=True)
    return t


B, T, size, V = 1, 8, 256, 12
H = W = size
N = B * T * size * size  # 524288
rcfg = RasterizeConfig()
Kmat = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
tgt_ext = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
tgt_ext = tgt_ext.at[:, :, 2, 3].set(jnp.linspace(0.0, 0.5, V)[None])
tgt_K = jnp.broadcast_to(Kmat, (B, V, 3, 3))
viewmat = jnp.eye(4)

# ---------------- fully-visible synthetic scene (524k) ----------------
rng = np.random.default_rng(0)
# 8 frames x 256^2 pixels: unproject every pixel of the identity view at a
# random depth in [1, 8] with +-30% xy scatter so neighbor views stay filled
u = (np.tile(np.arange(W), H * T) + 0.5) / W
v = (np.repeat(np.arange(H), W).reshape(1, -1).repeat(T, 0).ravel() + 0.5) / H
z = rng.uniform(1.0, 8.0, N).astype(np.float32)
x = (u - 0.5) * z * (1 + rng.uniform(-0.3, 0.3, N))
y = (v - 0.5) * z * (1 + rng.uniform(-0.3, 0.3, N))
means_live = jnp.asarray(np.stack([x, y, z], 1).astype(np.float32))
# radii of a few pixels: world scale ~ z * (px / f / W) * k, f=1
scales_live = jnp.asarray(
    (z[:, None] / W * rng.uniform(0.5, 3.0, (N, 3))).astype(np.float32))
rots_live = jnp.asarray(
    np.tile(np.array([0, 0, 0, 1], np.float32), (N, 1)))
sh_live = jnp.asarray(rng.normal(0, 0.3, (N, 3, 25)).astype(np.float32))
opac_live = jnp.asarray(rng.uniform(0.3, 0.9, N).astype(np.float32))
cov6_live = jax.jit(cov6_from_scale_rot)(scales_live, rots_live)
cov_dummy = jnp.zeros((N, 3, 3))

tm("render_12v_live",
   lambda e, k2, sh_, op_, c6: render(means_live, cov_dummy, sh_, op_, e, k2,
                                      (H, W), jnp.zeros(3), 4, cfg=rcfg,
                                      cov6=c6),
   tgt_ext[0], tgt_K[0], sh_live, opac_live, cov6_live, iters=10)
tm("render_view_1v_live",
   lambda m, sh_, op_, c6: render_view(m, cov_dummy, sh_, op_, viewmat, Kmat,
                                       (H, W), jnp.zeros(3), 4, cfg=rcfg,
                                       cov6=c6),
   means_live, sh_live, opac_live, cov6_live)

# coverage on the live scene at 3 trajectory views
cov33 = jax.jit(jax.vmap(lambda c6: jnp.array(
    [[c6[0], c6[1], c6[2]],
     [c6[1], c6[3], c6[4]],
     [c6[2], c6[4], c6[5]]])))(cov6_live)
cov_out = {}
cov_fn = jax.jit(lambda m, c33, sh_, op_, vm: coverage_stats(
    m, c33, sh_, op_, vm, Kmat, (H, W), 4, cfg=rcfg))
from vicasplat_tpu.geometry.se3 import rigid_inverse
for vi in (0, 6, 11):
    vm = rigid_inverse(tgt_ext[0, vi])
    st = cov_fn(means_live, cov33, sh_live, opac_live, vm)
    cov_out[f"view_{vi}"] = {k: float(v) for k, v in st.items()}
    print(f"coverage(live) view {vi}: {cov_out[f'view_{vi}']}", flush=True)

# ---------------- re-time the jittered sub-ops on the bench scene --------
cfg = VicaSplatConfig(backbone=VicaNetConfig(),
                      gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vicasplat(jax.random.PRNGKey(0), cfg))
K4 = jnp.broadcast_to(Kmat, (B, T, 3, 3))
imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, size, size, 3)) * 2 - 1
out = jax.jit(lambda im, p: vicasplat_forward(
    p, cfg, {"image": im, "intrinsics": K4}, dtype=jnp.bfloat16))(imgs, params)
g = out["gaussians"]
means = g.means.reshape(N, 3).astype(jnp.float32)
sh = g.harmonics.reshape(N, 3, -1).astype(jnp.float32)
opac = g.opacities.reshape(N).astype(jnp.float32)
cov6 = jax.jit(cov6_from_scale_rot)(
    g.scales.reshape(N, 3).astype(jnp.float32),
    g.rotations.reshape(N, 4).astype(jnp.float32))

splats = jax.jit(
    lambda m, sh_, op_, c6: project_gaussians(m, cov_dummy, sh_, op_, viewmat,
                                              Kmat, (H, W), 4, cov6=c6)
)(means, sh, opac, cov6)
sync(splats.mean2d[:8])

tm("full_bin_1v",
   lambda s: TL.bin_splats(s, (H, W), rcfg.tile_px, rcfg.dup_hw,
                           rcfg.max_per_tile),
   splats)
bins = jax.jit(lambda s: TL.bin_splats(
    s, (H, W), rcfg.tile_px, rcfg.dup_hw, rcfg.max_per_tile))(splats)
sync(bins.payload[0, 0])
tm("composite_1v",
   lambda p: composite_tiles(TileBins(payload=p), (H, W), rcfg.tile_px,
                             jnp.zeros(3), chunk=rcfg.chunk,
                             tile_group=rcfg.tile_group),
   bins.payload)
tm("render_view_1v",
   lambda m, sh_, op_, c6: render_view(m, cov_dummy, sh_, op_, viewmat, Kmat,
                                       (H, W), jnp.zeros(3), 4, cfg=rcfg,
                                       cov6=c6),
   means, sh, opac, cov6)

# live splats also exercise the binning with real (non-sentinel) keys
splats_live = jax.jit(
    lambda m, sh_, op_, c6: project_gaussians(m, cov_dummy, sh_, op_, viewmat,
                                              Kmat, (H, W), 4, cov6=c6)
)(means_live, sh_live, opac_live, cov6_live)
sync(splats_live.mean2d[:8])
tm("full_bin_1v_live",
   lambda s: TL.bin_splats(s, (H, W), rcfg.tile_px, rcfg.dup_hw,
                           rcfg.max_per_tile),
   splats_live)

# ---------------- merge into the committed artifact ----------------
out_path = pathlib.Path("/root/repo/outputs/perf_decomposition/decomp_r3.json")
art = json.loads(out_path.read_text())
# job 011's jitter-corrupted entries are replaced by this run's numbers
for k in ("keys_1v_ms", "full_bin_1v_ms", "render_view_1v_ms",
          "composite_1v_ms"):
    art["timings_ms"].pop(k, None)
art["timings_ms"].update(results)
art["coverage_stats"] = {
    "note": ("bench-scene gaussians come from a random-weight forward and "
             "are fully frustum-culled (live_frac 0, job 011); stats below "
             "are for the fully-visible synthetic 524k scene, the "
             "occupancy worst case. render timing live-vs-culled is "
             "compared in timings_ms (*_live entries)."),
    "live_scene": cov_out,
}
art["method"] = ("tools/benchlib.device_time (in-jit differenced scan; "
                 "per-phase minima, jobs 011+020)")
out_path.write_text(json.dumps(art, indent=2))
print("wrote", out_path)
