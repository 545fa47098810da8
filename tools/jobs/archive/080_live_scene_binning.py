"""Gather-locality honesty check: live vs empty flagship-scale scene.

The random-weight flagship scene culls to 0 live splats (means behind the
camera — parity with the reference's unconstrained pts3d), so bench.py's
render measures all-row-0 payload gathers. This job builds a LIVE
synthetic 524k-splat scene (uniform over the image, radius ~4-8 px,
random depths) and re-times binning + composite + 12-view render for both
binning paths, to bound how much gather locality flatters the empty-scene
numbers.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from benchlib import device_time, sync

from vicasplat_tpu.ops.rasterize.projection import Splats
from vicasplat_tpu.ops.rasterize import RasterizeConfig
from vicasplat_tpu.ops.rasterize.tiles import (
    bin_splats, bin_splats_origin, composite_tiles,
)

H = W = 256
N = 8 * 256 * 256
rc = RasterizeConfig()
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)


def make_splats(live_frac):
    mean2d = jax.random.uniform(ks[0], (N, 2)) * jnp.array([W, H])
    diag = jax.random.uniform(ks[1], (N, 2), minval=0.05, maxval=0.4)
    b = jax.random.uniform(ks[2], (N,), minval=-0.02, maxval=0.02)
    conic = jnp.stack([diag[:, 0], b, diag[:, 1]], -1)
    color = jax.random.uniform(ks[3], (N, 3))
    alpha = jax.random.uniform(ks[4], (N,), minval=0.1, maxval=0.9)
    depth = jax.random.uniform(ks[5], (N,), minval=0.5, maxval=30.0)
    radius = jnp.full((N,), 5.0) * (jax.random.uniform(ks[6], (N,)) < live_frac)
    return Splats(mean2d, conic, color, alpha, depth, radius)


bg = jnp.zeros(3)
for lf, tag in [(0.0, "empty"), (1.0, "live ")]:
    s = make_splats(lf)
    sync(s.mean2d[:4])
    for name, fn in [
        ("bin dup", lambda x: bin_splats(x, (H, W), rc.tile_px, rc.dup_hw,
                                         rc.max_per_tile)),
        ("bin org", lambda x: bin_splats_origin(x, (H, W), rc.tile_px,
                                                rc.dup_hw, rc.max_per_tile)),
    ]:
        t = device_time(fn, s, iters=20, repeats=2)
        print(f"[{tag}] {name:8s} {t*1e3:7.3f} ms/view")

    def full_dup(x):
        bins = bin_splats(x, (H, W), rc.tile_px, rc.dup_hw, rc.max_per_tile)
        return composite_tiles(bins, (H, W), rc.tile_px, bg,
                               chunk=rc.chunk, tile_group=rc.tile_group)

    def full_org(x):
        bins = bin_splats_origin(x, (H, W), rc.tile_px, rc.dup_hw,
                                 rc.max_per_tile)
        return composite_tiles(bins, (H, W), rc.tile_px, bg,
                               chunk=rc.chunk, tile_group=rc.tile_group)

    for name, fn in [("bin+comp dup", full_dup), ("bin+comp org", full_org)]:
        t = device_time(fn, s, iters=20, repeats=2)
        print(f"[{tag}] {name:13s} {t*1e3:7.3f} ms/view")

# exactness on the live scene (the empty-scene 0.0 was vacuous)
s = make_splats(1.0)
pd = jax.jit(full_dup)(s)
po = jax.jit(full_org)(s)
d = max(float(jnp.abs(a - b).max()) for a, b in zip(pd, po))
print(f"live-scene composited max|dup-origin|: {d:.3e}")
occ = (jax.jit(lambda x: bin_splats(x, (H, W), rc.tile_px, rc.dup_hw,
                                    rc.max_per_tile))(s).payload[..., 5] > 0)
print("mean tile occupancy:", float(occ.sum(1).mean()), "/", rc.max_per_tile)
