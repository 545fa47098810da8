"""Round-3 perf decomposition refresh, attempt 3 (see 067*.out, 072/076).

Attempts 1-2 hung the tunnel's remote compile. Root cause: timed closures
captured large arrays (the 578M-param pytree; the (N,3,25) SH table),
which jit embeds as HLO constants and the compile service drops the
ballooned request. Every body here takes its big operands as arguments.
Re-derives the forward/e2e/render decomposition at the current state on
the flagship scene shape, dumps coverage_stats, then runs bench.main().
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
from vicasplat_tpu.decoder.splatting import DecoderSplattingConfig, decoder_forward
from vicasplat_tpu.ops.rasterize.projection import project_gaussians, cov6_from_scale_rot
from vicasplat_tpu.ops.rasterize import tiles as TL
from vicasplat_tpu.ops.rasterize.render import render, render_view, coverage_stats, RasterizeConfig
from vicasplat_tpu.ops.rasterize.tiles import composite_tiles, TileBins

results = {}


def tm(name, fn, *args, iters=20, base=2):
    try:
        t = device_time(fn, *args, iters=iters, base=base, repeats=2)
    except Exception as e:
        print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    results[name + "_ms"] = t * 1e3
    print(f"{name:16s} {t*1e3:8.2f} ms", flush=True)
    return t


# ---- flagship scene: forward on 8 frames @ 256^2 (bench.py config) ----
cfg = VicaSplatConfig(backbone=VicaNetConfig(),
                      gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
B, T, size, V = 1, 8, 256, 12
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vicasplat(jax.random.PRNGKey(0), cfg))
K = jnp.broadcast_to(
    jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (B, T, 3, 3))
imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, size, size, 3)) * 2 - 1
tgt_ext = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
tgt_ext = tgt_ext.at[:, :, 2, 3].set(jnp.linspace(0.0, 0.5, V)[None])
tgt_K = jnp.broadcast_to(K[:, :1], (B, V, 3, 3))
dec_cfg = DecoderSplattingConfig()


def fwd_fn(im, p):
    return vicasplat_forward(p, cfg, {"image": im, "intrinsics": K},
                             dtype=jnp.bfloat16)


out = jax.jit(fwd_fn)(imgs, params)
g = out["gaussians"]
sync(g.means[0, 0, 0])

tm("forward", fwd_fn, imgs, params)


def e2e(im, p):
    o = vicasplat_forward(p, cfg, {"image": im, "intrinsics": K},
                          dtype=jnp.bfloat16)
    r = decoder_forward(dec_cfg, o["gaussians"], tgt_ext, tgt_K,
                        jnp.ones((B, V)), jnp.full((B, V), 100.0),
                        (size, size))
    return r.color, o["gaussian_camera_extrins"]


tm("e2e", e2e, imgs, params)

# ---- render decomposition on the forward's actual gaussians ----
N = B * T * size * size
means = g.means.reshape(N, 3).astype(jnp.float32)
scales = g.scales.reshape(N, 3).astype(jnp.float32)
rots = g.rotations.reshape(N, 4).astype(jnp.float32)
sh = g.harmonics.reshape(N, 3, -1).astype(jnp.float32)
opac = g.opacities.reshape(N).astype(jnp.float32)
cov6 = jax.jit(cov6_from_scale_rot)(scales, rots)
cov = jnp.zeros((N, 3, 3))  # unused when cov6 given
viewmat = jnp.eye(4)
Kmat = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
H = W = size
rcfg = RasterizeConfig()

tm("render_12v",
   lambda e, k2, sh_, op_, c6: render(means, cov, sh_, op_, e, k2, (H, W),
                                      jnp.zeros(3), 4, cfg=rcfg, cov6=c6),
   tgt_ext[0], tgt_K[0], sh, opac, cov6, iters=10)

tm("project_1v",
   lambda m, sh_, op_, c6: project_gaussians(m, cov, sh_, op_, viewmat, Kmat,
                                             (H, W), 4, cov6=c6),
   means, sh, opac, cov6)

splats = jax.jit(
    lambda m, sh_, op_, c6: project_gaussians(m, cov, sh_, op_, viewmat, Kmat,
                                              (H, W), 4, cov6=c6)
)(means, sh, opac, cov6)
sync(splats.mean2d[:8])

tile_px, dup, Kcap = rcfg.tile_px, rcfg.dup_hw, rcfg.max_per_tile
th = tw = H // tile_px
num_tiles = th * tw
tile_bits = (num_tiles + 1).bit_length()
depth_shift = 32 - tile_bits
KH, KW = dup
n = N


def keys_only(s):
    mx, my = s.mean2d[:, 0], s.mean2d[:, 1]
    r = s.radius
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
        jnp.maximum(s.depth, 1e-6).astype(jnp.float32), jnp.uint32
    ) >> (32 - depth_shift)
    sentinel = jnp.uint32(num_tiles) << depth_shift
    keys = []
    for dy in range(KH):
        for dx in range(KW):
            tyy = wy0 + dy
            txx = wx0 + dx
            ok = (tyy <= ty1) & (txx <= tx1) & live
            tile = (tyy * tw + txx).astype(jnp.uint32)
            keys.append(jnp.where(ok, (tile << depth_shift) | depth_bits, sentinel))
    return jnp.concatenate(keys)


def upto_sort(s):
    key = keys_only(s)
    gid = jnp.tile(jnp.arange(n, dtype=jnp.int32), KH * KW)
    return jax.lax.sort((key, gid), num_keys=1, is_stable=False)


def upto_ids(s):
    sk, si = upto_sort(s)
    tsk = jnp.arange(num_tiles, dtype=jnp.uint32) << depth_shift
    starts = jnp.searchsorted(sk, tsk, side="left")
    ends = jnp.searchsorted(sk, tsk + (jnp.uint32(1) << depth_shift), side="left")
    k = jnp.arange(Kcap, dtype=jnp.int32)
    starts_i = jnp.minimum(starts.astype(jnp.int32), n * KH * KW - Kcap)
    pos = starts_i[:, None] + k[None, :]
    valid = (pos >= starts[:, None].astype(jnp.int32)) & (pos < ends[:, None].astype(jnp.int32))
    ids = jax.vmap(lambda st: jax.lax.dynamic_slice_in_dim(si, st, Kcap))(starts_i)
    return ids, valid


def full_bin(s):
    return TL.bin_splats(s, (H, W), tile_px, dup, Kcap)


for name, fn in [("keys_1v", keys_only), ("keys+sort_1v", upto_sort),
                 ("keys+sort+ids_1v", upto_ids), ("full_bin_1v", full_bin)]:
    tm(name, fn, splats)

bins = jax.jit(full_bin)(splats)
sync(bins.payload[0, 0])
tm("composite_1v",
   lambda p: composite_tiles(TileBins(payload=p), (H, W), tile_px,
                             jnp.zeros(3), chunk=rcfg.chunk,
                             tile_group=rcfg.tile_group),
   bins.payload)

tm("render_view_1v",
   lambda m, sh_, op_, c6: render_view(m, cov, sh_, op_, viewmat, Kmat,
                                       (H, W), jnp.zeros(3), 4, cfg=rcfg,
                                       cov6=c6),
   means, sh, opac, cov6)

# ---- coverage stats for the flagship scene (3 of the 12 views) ----
cov33 = jax.jit(jax.vmap(lambda c6: jnp.array(
    [[c6[0], c6[1], c6[2]],
     [c6[1], c6[3], c6[4]],
     [c6[2], c6[4], c6[5]]])))(cov6)
cov_jobs = {}
cov_fn = jax.jit(lambda m, c33, sh_, op_, v: coverage_stats(
    m, c33, sh_, op_, v, Kmat, (H, W), 4, cfg=rcfg))
for vi in (0, 6, 11):
    vm = jnp.linalg.inv(tgt_ext[0, vi])
    st = cov_fn(means, cov33, sh, opac, vm)
    cov_jobs[f"view_{vi}"] = {k: float(v) for k, v in st.items()}
    print(f"coverage view {vi}: {cov_jobs[f'view_{vi}']}", flush=True)

out_dir = pathlib.Path("/root/repo/outputs/perf_decomposition")
out_dir.mkdir(parents=True, exist_ok=True)
with open(out_dir / "decomp_r3.json", "w") as f:
    json.dump({"timings_ms": {k: round(v, 3) for k, v in results.items()},
               "coverage_stats": cov_jobs,
               "scene": "flagship bench scene: 8f 256^2 forward, 12-view render",
               "method": "tools/benchlib.device_time (in-jit differenced scan)"},
              f, indent=2)
print("wrote", out_dir / "decomp_r3.json")

import bench
bench.main()
