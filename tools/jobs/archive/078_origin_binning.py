"""Origin binning vs dup-sort binning on the flagship scene (TPU).

bin_splats_origin sorts N=524k (origin|depth, validbits|idx) pairs instead
of N*4 duplicated pairs, then depth-merges each tile's 2x2 neighbor
segments with an in-graph bitonic network (66 reshape/min-max stages on a
single u32 word). Measures: bin-only, full single view, 12-view render,
and checks output parity. All big operands passed as jit ARGUMENTS (the
capture-compile hazard, see CLAUDE.md round-3 note).
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from benchlib import device_time, sync

from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig,
    init_vicasplat, vicasplat_forward,
)
from vicasplat_tpu.ops.rasterize import RasterizeConfig, render
from vicasplat_tpu.ops.rasterize.projection import (
    project_gaussians, cov6_from_scale_rot,
)
from vicasplat_tpu.ops.rasterize.tiles import bin_splats, bin_splats_origin

cfg = VicaSplatConfig(backbone=VicaNetConfig(),
                      gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
B, T, size = 1, 8, 256
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vicasplat(jax.random.PRNGKey(0), cfg))
K = jnp.broadcast_to(
    jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (B, T, 3, 3))
imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, size, size, 3)) * 2 - 1
out = jax.jit(lambda im, p: vicasplat_forward(
    p, cfg, {"image": im, "intrinsics": K}, dtype=jnp.bfloat16))(imgs, params)
g = out["gaussians"]
N = B * T * size * size
means = g.means.reshape(N, 3).astype(jnp.float32)
scales = g.scales.reshape(N, 3).astype(jnp.float32)
rots = g.rotations.reshape(N, 4).astype(jnp.float32)
sh = g.harmonics.reshape(N, 3, -1).astype(jnp.float32)
opac = g.opacities.reshape(N).astype(jnp.float32)
cov6 = jax.jit(cov6_from_scale_rot)(scales, rots)
cov = jnp.zeros((N, 3, 3))
viewmat = jnp.eye(4)
Kmat = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
H = W = size
splats = jax.jit(
    lambda m, c6, s, o: project_gaussians(m, cov, s, o, viewmat, Kmat,
                                          (H, W), 4, cov6=c6)
)(means, cov6, sh, opac)
sync(splats.mean2d[:8])

rc = RasterizeConfig()

# --- bin-only timing (payload sum forces full materialization) ---
def bin_dup(s):
    return bin_splats(s, (H, W), rc.tile_px, rc.dup_hw, rc.max_per_tile)

def bin_org(s):
    return bin_splats_origin(s, (H, W), rc.tile_px, rc.dup_hw, rc.max_per_tile)

for name, fn in [("bin dup_sort", bin_dup), ("bin origin", bin_org)]:
    t = device_time(fn, splats, iters=20, repeats=2)
    print(f"{name:16s} {t*1e3:7.3f} ms/view")

# --- parity of composited output on the real scene ---
pd = jax.jit(bin_dup)(splats)
po = jax.jit(bin_org)(splats)
from vicasplat_tpu.ops.rasterize.tiles import composite_tiles
bg = jnp.zeros(3)
cd = jax.jit(lambda b: composite_tiles(b, (H, W), rc.tile_px, bg,
                                       chunk=rc.chunk, tile_group=rc.tile_group))(pd)
co = jax.jit(lambda b: composite_tiles(b, (H, W), rc.tile_px, bg,
                                       chunk=rc.chunk, tile_group=rc.tile_group))(po)
d = max(float(jnp.abs(a - b).max()) for a, b in zip(cd, co))
print(f"composited max|dup-origin| on flagship scene: {d:.3e}")

# --- 12-view render, both binnings ---
Vv = 12
exts = jnp.broadcast_to(jnp.eye(4), (Vv, 4, 4))
Ks = jnp.broadcast_to(Kmat, (Vv, 3, 3))

def render12(m, c6, s, o, binning):
    c, dep, a = render(m, cov, s, o, exts, Ks, (H, W), bg, 4,
                       cfg=dataclasses.replace(rc, binning=binning), cov6=c6)
    return c

for binning in ("dup_sort", "origin"):
    t = device_time(lambda m, c6, s, o: render12(m, c6, s, o, binning),
                    means, cov6, sh, opac, iters=10, repeats=2)
    print(f"render 12v [{binning:8s}] {t*1e3:7.2f} ms")
