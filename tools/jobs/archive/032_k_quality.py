"""max_per_tile quality/speed study on a realistic pixel-aligned scene.

Builds 524k pixel-aligned gaussians (8 frames x 256^2, smooth depth surface,
pixel-sized scales, mostly-opaque alphas — the regime the encoder actually
emits), renders novel views at K in {256, 384, 512, 1024} and reports
PSNR vs the K=1024 reference plus per-view render time.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import dataclasses
import jax
import jax.numpy as jnp
from benchlib import device_time, sync

from vicasplat_tpu.ops.rasterize.render import render, RasterizeConfig

H = W = 256
T = 8
fx = fy = 1.0 * W  # normalized f=1.0
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 10)

# smooth depth surface per frame + pixel grid unprojection
ys, xs = jnp.meshgrid(jnp.arange(H) + 0.5, jnp.arange(W) + 0.5, indexing="ij")
means_all, scales_all = [], []
for t in range(T):
    phase = t * 0.7
    depth = 2.0 + 0.5 * jnp.sin(xs / 37.0 + phase) * jnp.cos(ys / 29.0 - phase) \
        + 0.3 * jnp.sin((xs + ys) / 53.0)
    X = (xs - W / 2) / fx * depth
    Y = (ys - H / 2) / fy * depth
    # frames offset slightly along x
    means_all.append(jnp.stack([X + 0.05 * t, Y, depth], -1).reshape(-1, 3))
    scales_all.append((depth * 1.4 / fx).reshape(-1))
means = jnp.concatenate(means_all)
N = means.shape[0]
px_scale = jnp.concatenate(scales_all)
scales = px_scale[:, None] * jnp.exp(jax.random.normal(ks[1], (N, 3)) * 0.25)
quat = jax.random.normal(ks[2], (N, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
w, x, y, z = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
R = jnp.stack([
    1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
    2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
    2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
], axis=-1).reshape(-1, 3, 3)
cov = jnp.einsum("nij,nj,nkj->nik", R, scales**2, R)
sh = jax.random.normal(ks[3], (N, 3, 25)) * jnp.concatenate(
    [jnp.full((1,), 0.6), jnp.full((24,), 0.05)])[None, None, :]
op_hi = jax.random.uniform(ks[4], (N,), minval=0.5, maxval=0.99)
op_lo = jax.random.uniform(ks[5], (N,), minval=0.02, maxval=0.3)
opac = jnp.where(jax.random.uniform(ks[6], (N,)) < 0.8, op_hi, op_lo)

V = 3
ext = jnp.broadcast_to(jnp.eye(4), (V, 4, 4))
ext = ext.at[:, 0, 3].set(jnp.array([0.1, 0.25, 0.4]))
ext = ext.at[:, 2, 3].set(jnp.array([-0.1, -0.2, -0.3]))
Kmat = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
Ks = jnp.broadcast_to(Kmat, (V, 3, 3))
bg = jnp.zeros(3)

outs = {}
for k_ in (1024, 512, 384, 256):
    cfg = RasterizeConfig(max_per_tile=k_)
    f = jax.jit(lambda e, K_: render(means, cov, sh, opac, e, K_, (H, W), bg, 4, cfg=cfg))
    c, d, a = f(ext, Ks)
    sync(c[..., :1])
    outs[k_] = (c, d, a)
    t = device_time(lambda m: render(m, cov, sh, opac, ext, Ks, (H, W), bg, 4, cfg=cfg),
                    means, iters=10, base=2)
    print(f"K={k_}: render 3v {t*1e3:.2f} ms ({t/V*1e3:.2f} ms/view)")

ref = outs[1024][0]
for k_ in (512, 384, 256):
    c = outs[k_][0]
    mse = float(jnp.mean((c - ref) ** 2))
    psnr = -10 * jnp.log10(mse) if mse > 0 else float("inf")
    print(f"K={k_}: vs K=1024 PSNR {float(psnr):.1f} dB, mean|dC| {float(jnp.abs(c-ref).mean()):.5f}, max {float(jnp.abs(c-ref).max()):.4f}")

# tile occupancy stats (how full are the per-tile lists really?)
from vicasplat_tpu.ops.rasterize.projection import project_gaussians
from vicasplat_tpu.ops.rasterize import tiles as tl
viewmat = jnp.linalg.inv(ext[1])
s = jax.jit(lambda: project_gaussians(means, cov, sh, opac, viewmat, Kmat, (H, W), 4))()
kb = jax.jit(lambda s: tl.bin_splats(s, (H, W), 16, (2, 2), 1024))(s)
occ = (kb.payload[..., 5] > 0).sum(axis=1)
print("per-tile live entries: mean", float(occ.mean()), "p50",
      float(jnp.percentile(occ.astype(jnp.float32), 50)), "p95",
      float(jnp.percentile(occ.astype(jnp.float32), 95)), "max", int(occ.max()))
