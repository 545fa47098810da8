"""Sort-variant shootout for the binning hot path (VERDICT r2 #8).

The 12-view render spends ~12 x 2.2 ms in lax.sort of 2.1M (u32 key, i32
gauss-idx) pairs. Ideas measured here, on the exact production key
distribution (flagship-scene splats):

  a) current: (u32 key, i32 idx) pair sort, is_stable=False
  b) single u64 array with idx packed in the low 21 bits (tile 9 | depth 34
     | idx 21) — one comparison array, no value permutation
  c) u64 (b) but depth bits truncated to 23 like today (tile 9 | depth 23 |
     idx 21 in a u64 with 11 zero bits)
  d) keys-only u32 sort (lower bound: what the idx permutation costs)
  e) f32 depth-only sort of N=524k (lower bound if duplication could be
     done after sorting)
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from benchlib import device_time, sync

from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig,
    init_vicasplat, vicasplat_forward,
)
from vicasplat_tpu.ops.rasterize.projection import project_gaussians, cov6_from_scale_rot

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
splats = jax.jit(lambda m: project_gaussians(m, cov, sh, opac, viewmat, Kmat,
                                             (H, W), 4, cov6=cov6))(means)
sync(splats.mean2d[:8])

tile_px, (KH, KW), tw, th = 16, (2, 2), 16, 16
num_tiles = th * tw
tile_bits = (num_tiles + 1).bit_length()
depth_shift32 = 32 - tile_bits
n = N


def make_keys32(s):
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
    ) >> (32 - depth_shift32)
    sentinel = jnp.uint32(num_tiles) << depth_shift32
    keys = []
    for dy in range(KH):
        for dx in range(KW):
            tyy = wy0 + dy
            txx = wx0 + dx
            ok = (tyy <= ty1) & (txx <= tx1) & live
            tile = (tyy * tw + txx).astype(jnp.uint32)
            keys.append(jnp.where(ok, (tile << depth_shift32) | depth_bits, sentinel))
    return jnp.concatenate(keys)


def sort_pair32(s):
    key = make_keys32(s)
    gid = jnp.tile(jnp.arange(n, dtype=jnp.int32), KH * KW)
    return jax.lax.sort((key, gid), num_keys=1, is_stable=False)


def sort_u64_packed(s):
    key32 = make_keys32(s).astype(jnp.uint64)
    gid = jnp.tile(jnp.arange(n, dtype=jnp.uint32), KH * KW).astype(jnp.uint64)
    k64 = (key32 << jnp.uint64(21)) | gid
    sk = jax.lax.sort(k64, is_stable=False)
    return sk >> jnp.uint64(21), (sk & jnp.uint64((1 << 21) - 1)).astype(jnp.int32)


def sort_keys_only(s):
    return jax.lax.sort(make_keys32(s), is_stable=False)


def sort_depth_524k(s):
    return jax.lax.sort(s.depth, is_stable=False)


for name, fn in [("pair32 (current)", sort_pair32),
                 ("u64 packed idx", sort_u64_packed),
                 ("keys-only u32", sort_keys_only),
                 ("depth-only 524k", sort_depth_524k)]:
    try:
        t = device_time(fn, splats, iters=20, repeats=2)
        print(f"{name:20s} {t*1e3:7.3f} ms")
    except Exception as e:
        print(f"{name:20s} FAILED {type(e).__name__}: {str(e)[:200]}")

# correctness cross-check: u64 route reproduces the pair-sort tile segments
sk32, si32 = jax.jit(sort_pair32)(splats)
sk64, si64 = jax.jit(sort_u64_packed)(splats)
import numpy as np
a = np.asarray(sk32, dtype=np.uint64)
b = np.asarray(sk64)
print("keys equal:", bool((a == b).all()))
# idx equal only where keys unique (unstable ties differ); check a segment sum
print("idx multiset equal:", int(np.asarray(si32).astype(np.int64).sum())
      == int(np.asarray(si64).astype(np.int64).sum()))
