"""Re-validated timing (abs-sum accumulation) + binning design variants."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from benchlib import device_time, sync

M = 4096
a = jax.random.normal(jax.random.PRNGKey(0), (M, M), jnp.bfloat16)
b = jax.random.normal(jax.random.PRNGKey(1), (M, M), jnp.bfloat16)
for n in (5, 20, 50):
    t = device_time(lambda a, b: a @ b, a, b, iters=n, base=2)
    print(f"matmul4096 iters={n}: {t*1e3:.3f} ms ({137.4/t/1e3:.1f} TFLOP/s)")

from vicasplat_tpu.ops.rasterize.projection import project_gaussians
from vicasplat_tpu.ops.rasterize.tiles import bin_splats, composite_tiles
from vicasplat_tpu.ops.rasterize.render import render, RasterizeConfig

N = 524288
H = W = 256
V = 12
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
bg = jnp.zeros(3)
ext = jnp.broadcast_to(jnp.eye(4), (V, 4, 4))
ext = ext.at[:, 2, 3].set(jnp.linspace(0.0, 0.5, V))
Ks = jnp.broadcast_to(Kmat, (V, 3, 3))

t = device_time(lambda m: project_gaussians(m, cov, sh, opac, viewmat, Kmat, (H, W), 4),
                means, iters=30)
print(f"project: {t*1e3:.3f} ms/view")
splats = jax.jit(lambda m: project_gaussians(m, cov, sh, opac, viewmat, Kmat, (H, W), 4))(means)
sync(splats.mean2d[:8])
t = device_time(lambda s: bin_splats(s, (H, W), 16, (2, 2), 512), splats, iters=30)
print(f"bin: {t*1e3:.3f} ms/view")
bins = jax.jit(lambda s: bin_splats(s, (H, W), 16, (2, 2), 512))(splats)
sync(bins.payload[0, :2])
t = device_time(lambda b: composite_tiles(b, (H, W), 16, bg, chunk=256, tile_group=64),
                bins, iters=30)
print(f"composite xla: {t*1e3:.3f} ms/view")
cfg = RasterizeConfig()
t = device_time(lambda m, e, k: render(m, cov, sh, opac, e, k, (H, W), bg, 4, cfg=cfg),
                means, ext, Ks, iters=8, base=2)
print(f"full render 12v [xla]: {t*1e3:.1f} ms")

# --- sort variants ---
E4 = 4 * N
kk = jax.random.randint(key, (E4,), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
idx4 = jnp.arange(E4, dtype=jnp.int32)
print(f"sort 2.1M k+i: {device_time(lambda k: jax.lax.sort((k, idx4), num_keys=1), kk, iters=20)*1e3:.3f} ms")
print(f"sort 524k k+i: {device_time(lambda k: jax.lax.sort((k[:N], idx4[:N]), num_keys=1), kk, iters=20)*1e3:.3f} ms")
kkB = jnp.broadcast_to(kk, (V, E4)) + jnp.arange(V, dtype=jnp.uint32)[:, None]
idxB = jnp.broadcast_to(idx4, (V, E4))
print(f"sort (12,2.1M) batched k+i: {device_time(lambda k: jax.lax.sort((k, idxB), num_keys=1, dimension=1), kkB, iters=5, base=1)*1e3:.3f} ms")
kk1B = jnp.broadcast_to(kk[:N], (V, N)) + jnp.arange(V, dtype=jnp.uint32)[:, None]
idx1B = jnp.broadcast_to(idx4[:N], (V, N))
print(f"sort (12,524k) batched k+i: {device_time(lambda k: jax.lax.sort((k, idx1B), num_keys=1, dimension=1), kk1B, iters=8, base=1)*1e3:.3f} ms")
# sort keys only (is the idx payload significant?)
print(f"sort 2.1M keys only: {device_time(lambda k: jax.lax.sort(k), kk, iters=20)*1e3:.3f} ms")

# --- gather variants (payload gather is 131k rows) ---
G_ = 131072
tab32 = jax.random.normal(key, (N, 16))
tab16 = tab32.astype(jnp.bfloat16)
tab16w = jax.random.normal(key, (N, 32)).astype(jnp.bfloat16)
tab128 = jax.random.normal(key, (N // 8, 128))
rid = jax.random.randint(key, (G_,), 0, N)
print(f"gather 131k rows (16,f32): {device_time(lambda i: tab32[i], rid, iters=20)*1e3:.3f} ms")
print(f"gather 131k rows (16,bf16): {device_time(lambda i: tab16[i], rid, iters=20)*1e3:.3f} ms")
print(f"gather 131k rows (32,bf16): {device_time(lambda i: tab16w[i], rid, iters=20)*1e3:.3f} ms")
print(f"gather 131k rows (128,f32): {device_time(lambda i: tab128[i % (N // 8)], rid, iters=20)*1e3:.3f} ms")
print(f"gather 1.57M rows (16,bf16) [3 views worth]: {device_time(lambda i: tab16[jnp.concatenate([i, i + 1, i + 2]) % N], rid, iters=10)*1e3:.3f} ms")

# --- key-build cost alone (the 4-slot window keys) ---
def build_keys(s):
    from vicasplat_tpu.ops.rasterize import tiles as T_
    mx, my = s.mean2d[:, 0], s.mean2d[:, 1]
    r = s.radius
    live = r > 0
    tw = th = 16
    inv_t = 1.0 / 16
    tx0 = jnp.clip(jnp.floor((mx - r) * inv_t), 0, tw - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mx + r) * inv_t), 0, tw - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((my - r) * inv_t), 0, th - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((my + r) * inv_t), 0, th - 1).astype(jnp.int32)
    ctx = jnp.clip(jnp.floor(mx * inv_t), 0, tw - 1).astype(jnp.int32)
    cty = jnp.clip(jnp.floor(my * inv_t), 0, th - 1).astype(jnp.int32)
    wx0 = jnp.clip(ctx, tx0, jnp.maximum(tx1 - 1, tx0))
    wy0 = jnp.clip(cty, ty0, jnp.maximum(ty1 - 1, ty0))
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(s.depth, 1e-6).astype(jnp.float32), jnp.uint32) >> 9
    keys = []
    for dy in range(2):
        for dx in range(2):
            tyy = wy0 + dy
            txx = wx0 + dx
            ok = (tyy <= ty1) & (txx <= tx1) & live
            tile = (tyy * tw + txx).astype(jnp.uint32)
            keys.append(jnp.where(ok, (tile << 23) | depth_bits, jnp.uint32(256) << 23))
    return jnp.concatenate(keys)

print(f"key build 4-slot: {device_time(build_keys, splats, iters=20)*1e3:.3f} ms")
