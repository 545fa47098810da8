"""Render decomposition benchmark: 524k splats, 12 views, 256^2.

Times: projection, binning(sort+gather), composite XLA, composite Pallas,
and the full render with each backend.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

from vicasplat_tpu.ops.rasterize.projection import project_gaussians
from vicasplat_tpu.ops.rasterize.tiles import bin_splats, composite_tiles, pack_payload
from vicasplat_tpu.ops.rasterize.pallas_composite import composite_tiles_pallas
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


def quat_to_mat(q):
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(-1, 3, 3)


R = quat_to_mat(quat)
cov = jnp.einsum("nij,nj,nkj->nik", R, scales**2, R)
sh = jax.random.normal(ks[3], (N, 3, 25)) * 0.2
opac = jax.nn.sigmoid(jax.random.normal(ks[4], (N,)))
viewmat = jnp.eye(4)
Kmat = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
bg = jnp.zeros(3)

ext = jnp.broadcast_to(jnp.eye(4), (V, 4, 4))
ext = ext.at[:, 2, 3].set(jnp.linspace(0.0, 0.5, V))
Ks = jnp.broadcast_to(Kmat, (V, 3, 3))


def timeit(fn, *args, n=20, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(leaf.ravel()[0])
    return (time.time() - t0) / n


proj = jax.jit(lambda: project_gaussians(means, cov, sh, opac, viewmat, Kmat, (H, W), 4))
t_proj = timeit(proj)
splats = jax.block_until_ready(proj())

binf = jax.jit(lambda s: bin_splats(s, (H, W), 16, (2, 2), 512))
t_bin = timeit(binf, splats)
bins = jax.block_until_ready(binf(splats))

cx = jax.jit(lambda b: composite_tiles(b, (H, W), 16, bg, chunk=256, tile_group=64))
t_cx = timeit(cx, bins)

cp = jax.jit(lambda b: composite_tiles_pallas(b, (H, W), 16, (0.0, 0.0, 0.0), 256))
try:
    t_cp = timeit(cp, bins)
except Exception as e:
    t_cp = float("nan")
    print("pallas composite failed:", repr(e))

# compare outputs
ox = jax.block_until_ready(cx(bins))
try:
    op = jax.block_until_ready(cp(bins))
    dc = float(jnp.abs(ox[0] - op[0]).max())
    print(f"pallas-vs-xla max|dC| {dc:.2e}")
except Exception as e:
    print("pallas compare failed:", repr(e))

for backend in ("xla", "pallas"):
    cfg = RasterizeConfig(backend=backend)
    rf = jax.jit(lambda e, k: render(means, cov, sh, opac, e, k, (H, W), bg, 4, cfg=cfg))
    try:
        t_full = timeit(rf, ext, Ks, n=5)
        print(f"full render 12v [{backend}]: {t_full*1e3:.1f} ms")
    except Exception as e:
        print(f"full render [{backend}] failed:", repr(e))

print(f"project: {t_proj*1e3:.2f} ms/view")
print(f"bin(sort+gather): {t_bin*1e3:.2f} ms/view")
print(f"composite xla: {t_cx*1e3:.2f} ms/view")
print(f"composite pallas: {t_cp*1e3:.2f} ms/view")
