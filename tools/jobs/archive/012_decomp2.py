"""Render decomposition with dispatch-overhead-free in-jit timing."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "tools.benchlib"]:
    del sys.modules[m]

import importlib
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")
import benchlib
importlib.reload(benchlib)
from benchlib import device_time, dispatch_overhead

from vicasplat_tpu.ops.rasterize.projection import project_gaussians
from vicasplat_tpu.ops.rasterize.tiles import bin_splats, composite_tiles
from vicasplat_tpu.ops.rasterize.pallas_composite import composite_tiles_pallas
from vicasplat_tpu.ops.rasterize.render import render, RasterizeConfig

print(f"dispatch overhead: {dispatch_overhead()*1e3:.1f} ms/call")

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

t = device_time(
    lambda m: project_gaussians(m, cov, sh, opac, viewmat, Kmat, (H, W), 4),
    means, iters=30)
print(f"project: {t*1e3:.3f} ms/view")

splats = jax.jit(lambda m: project_gaussians(m, cov, sh, opac, viewmat, Kmat, (H, W), 4))(means)
splats = jax.block_until_ready(splats)

t = device_time(lambda s: bin_splats(s, (H, W), 16, (2, 2), 512), splats, iters=30)
print(f"bin(keys+sort+gather): {t*1e3:.3f} ms/view")

bins = jax.block_until_ready(jax.jit(lambda s: bin_splats(s, (H, W), 16, (2, 2), 512))(splats))

t = device_time(lambda b: composite_tiles(b, (H, W), 16, bg, chunk=256, tile_group=64),
                bins, iters=30)
print(f"composite xla (chunk256): {t*1e3:.3f} ms/view")

for ch in (64, 128, 256):
    try:
        t = device_time(lambda b: composite_tiles_pallas(b, (H, W), 16, (0., 0., 0.), ch),
                        bins, iters=30)
        print(f"composite pallas (chunk{ch}): {t*1e3:.3f} ms/view")
    except Exception as e:
        print(f"composite pallas (chunk{ch}) failed: {type(e).__name__}: {str(e)[:300]}")

# correctness
ox = jax.jit(lambda b: composite_tiles(b, (H, W), 16, bg, chunk=256, tile_group=64))(bins)
try:
    op = jax.jit(lambda b: composite_tiles_pallas(b, (H, W), 16, (0., 0., 0.), 128))(bins)
    print(f"pallas-vs-xla max|dC| {float(jnp.abs(ox[0]-op[0]).max()):.2e} "
          f"max|dD| {float(jnp.abs(ox[1]-op[1]).max()):.2e}")
except Exception as e:
    print("pallas compare failed:", type(e).__name__, str(e)[:200])

for backend, ch in (("xla", 256), ("pallas", 128)):
    cfg = RasterizeConfig(backend=backend, chunk=ch)
    try:
        t = device_time(
            lambda m, e, k: render(m, cov, sh, opac, e, k, (H, W), bg, 4, cfg=cfg),
            means, ext, Ks, iters=10)
        print(f"full render 12v [{backend} chunk{ch}]: {t*1e3:.1f} ms")
    except Exception as e:
        print(f"full render [{backend}] failed: {type(e).__name__}: {str(e)[:200]}")

# ---- sort/gather/scatter micro ----
E4 = 4 * N
E1 = N
kk = jax.random.randint(key, (E4,), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
idx4 = jnp.arange(E4, dtype=jnp.int32)
print(f"sort {E4} key+idx : {device_time(lambda k: jax.lax.sort((k, idx4), num_keys=1), kk, iters=20)*1e3:.3f} ms")
print(f"sort {E1} key+idx : {device_time(lambda k: jax.lax.sort((k[:E1], idx4[:E1]), num_keys=1), kk, iters=20)*1e3:.3f} ms")
perm = jax.random.permutation(key, E4).astype(jnp.int32)
val = kk.astype(jnp.float32)
print(f"scatter {E4} f32 unique: {device_time(lambda p: jnp.zeros((E4,), jnp.float32).at[p].set(val, unique_indices=True, mode='drop'), perm, iters=20)*1e3:.3f} ms")
tab = jax.random.normal(key, (E1, 16))
rid = jax.random.randint(key, (131072,), 0, E1)
print(f"row-gather 131k x16 from 524k: {device_time(lambda i: tab[i], rid, iters=20)*1e3:.3f} ms")
tid = jax.random.randint(key, (E4,), 0, 256, dtype=jnp.int32)
print(f"segsum hist 2.1M->256: {device_time(lambda t_: jax.ops.segment_sum(jnp.ones_like(t_), t_, num_segments=256), tid, iters=20)*1e3:.3f} ms")
