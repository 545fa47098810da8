"""Measure packed vs exact payload gather in bin_splats + full render."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from benchlib import device_time, sync

from vicasplat_tpu.ops.rasterize.projection import project_gaussians
from vicasplat_tpu.ops.rasterize.tiles import bin_splats
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

splats = jax.jit(lambda m: project_gaussians(m, cov, sh, opac, viewmat, Kmat, (H, W), 4))(means)
sync(splats.mean2d[:8])

for packed in (False, True):
    t = device_time(lambda s: bin_splats(s, (H, W), 16, (2, 2), 512, packed_gather=packed),
                    splats, iters=30)
    print(f"bin packed={packed}: {t*1e3:.3f} ms/view")

for packed in (False, True):
    cfg = RasterizeConfig(packed_gather=packed)
    t = device_time(lambda m, e, k: render(m, cov, sh, opac, e, k, (H, W), bg, 4, cfg=cfg),
                    means, ext, Ks, iters=10, base=2)
    print(f"full render 12v packed={packed}: {t*1e3:.1f} ms")

# backward (training-relevant): grad of mean over a target for 2 views
tgt = jnp.zeros((2, H, W, 3))
for packed in (False, True):
    cfg = RasterizeConfig(packed_gather=packed)

    def loss(m, e, k):
        c, _, _ = render(m, cov, sh, opac, e, k, (H, W), bg, 4, cfg=cfg)
        return ((c - tgt) ** 2).mean()

    t = device_time(jax.grad(loss), means, ext[:2], Ks[:2], iters=6, base=2)
    print(f"render 2v backward packed={packed}: {t*1e3:.1f} ms")
