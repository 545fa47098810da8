"""In-context bin_splats stage decomposition + fresh render/e2e numbers."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib", "bench")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from benchlib import device_time, sync

from vicasplat_tpu.ops.rasterize.projection import project_gaussians
from vicasplat_tpu.ops.rasterize import tiles as TL
from vicasplat_tpu.ops.rasterize.render import render, RasterizeConfig

N = 524288
H = W = 256
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
means = jax.random.normal(ks[0], (N, 3)) * jnp.array([0.6, 0.6, 0.3]) + jnp.array([0.0, 0.0, 2.0])
scales = jnp.exp(jax.random.normal(ks[1], (N, 3)) * 0.3) * 0.01
quat = jax.random.normal(ks[2], (N, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
w, x, y, z = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
R = jnp.stack([
    1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
    2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
    2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
], axis=-1).reshape(-1, 3, 3)
cov = jnp.einsum("nij,nj,nkj->nik", R, scales**2, R)
sh = jax.random.normal(ks[3], (N, 3, 25)) * 0.2
opac = jax.nn.sigmoid(jax.random.normal(ks[4], (N,)))
viewmat = jnp.eye(4)
Kmat = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
splats = jax.jit(lambda m: project_gaussians(m, cov, sh, opac, viewmat, Kmat, (H, W), 4))(means)
sync(splats.mean2d[:8])

tile_px, dup, K = 16, (2, 2), 512
th = tw = H // tile_px
num_tiles = th * tw
tile_bits = (num_tiles + 1).bit_length()
depth_shift = 32 - tile_bits
n = N
KH, KW = dup


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
    return jax.lax.sort((key, gid), num_keys=1)


def upto_ids(s):
    sk, si = upto_sort(s)
    tsk = jnp.arange(num_tiles, dtype=jnp.uint32) << depth_shift
    starts = jnp.searchsorted(sk, tsk, side="left")
    ends = jnp.searchsorted(sk, tsk + (jnp.uint32(1) << depth_shift), side="left")
    k = jnp.arange(K, dtype=jnp.int32)
    starts_i = jnp.minimum(starts.astype(jnp.int32), n * KH * KW - K)
    pos = starts_i[:, None] + k[None, :]
    valid = (pos >= starts[:, None].astype(jnp.int32)) & (pos < ends[:, None].astype(jnp.int32))
    ids = jax.vmap(lambda st: jax.lax.dynamic_slice_in_dim(si, st, K))(starts_i)
    return ids, valid


def full_bin(s):
    return TL.bin_splats(s, (H, W), tile_px, dup, K)


print(f"keys:        {device_time(keys_only, splats, iters=30, repeats=2)*1e3:.3f} ms")
print(f"+sort:       {device_time(upto_sort, splats, iters=30, repeats=2)*1e3:.3f} ms")
print(f"+seg/ids:    {device_time(upto_ids, splats, iters=30, repeats=2)*1e3:.3f} ms")
print(f"full bin:    {device_time(full_bin, splats, iters=30, repeats=2)*1e3:.3f} ms")

V = 12
ext = jnp.broadcast_to(jnp.eye(4), (V, 4, 4))
ext = ext.at[:, 2, 3].set(jnp.linspace(0.0, 0.5, V))
Ks = jnp.broadcast_to(Kmat, (V, 3, 3))
bg = jnp.zeros(3)
t = device_time(lambda m, e, k2: render(m, cov, sh, opac, e, k2, (H, W), bg, 4,
                                        cfg=RasterizeConfig()),
                means, ext, Ks, iters=10, base=2, repeats=2)
print(f"full render 12v: {t*1e3:.1f} ms")

import bench
bench.main()
