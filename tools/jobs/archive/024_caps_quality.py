"""Rasterizer-cap quality study vs the BRUTEFORCE oracle (VERDICT r3 #3).

Dense worst-case pixel-aligned scene (8 frames x 256^2 = 524k gaussians,
smooth depth surface, pixel scales, mostly-opaque — the regime the encoder
emits; same generator as archived jobs 032/034 whose results were lost in
the 08-18 workspace wipe). For each (dup_hw, max_per_tile) we record PSNR
vs the exact chunked bruteforce oracle
(ops/rasterize/reference.py:render_view_bruteforce_chunked), per-view
render time, and coverage_stats. Output JSON:
outputs/rasterizer_caps/caps_study_synthetic.json — the error table that
backs the adaptive cap-selection policy (reference rasterizer is unbounded:
src/model/decoder/cuda_splatting.py:148-239).
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from benchlib import device_time, sync

from vicasplat_tpu.geometry.se3 import rigid_inverse
from vicasplat_tpu.ops.rasterize.render import (
    RasterizeConfig, coverage_stats, render,
)
from vicasplat_tpu.ops.rasterize.reference import render_view_bruteforce_chunked

H = W = 256
T = 8
fx = fy = 1.0 * W
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 10)

ys, xs = jnp.meshgrid(jnp.arange(H) + 0.5, jnp.arange(W) + 0.5, indexing="ij")
means_all, scales_all = [], []
for t in range(T):
    phase = t * 0.7
    depth = 2.0 + 0.5 * jnp.sin(xs / 37.0 + phase) * jnp.cos(ys / 29.0 - phase) \
        + 0.3 * jnp.sin((xs + ys) / 53.0)
    X = (xs - W / 2) / fx * depth
    Y = (ys - H / 2) / fy * depth
    means_all.append(jnp.stack([X + 0.05 * t, Y, depth], -1).reshape(-1, 3))
    scales_all.append((depth * 1.4 / fx).reshape(-1))
means = jnp.concatenate(means_all)
N = means.shape[0]
px_scale = jnp.concatenate(scales_all)
scales = px_scale[:, None] * jnp.exp(jax.random.normal(ks[1], (N, 3)) * 0.25)
quat = jax.random.normal(ks[2], (N, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
w_, x_, y_, z_ = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
R = jnp.stack([
    1 - 2 * (y_ * y_ + z_ * z_), 2 * (x_ * y_ - w_ * z_), 2 * (x_ * z_ + w_ * y_),
    2 * (x_ * y_ + w_ * z_), 1 - 2 * (x_ * x_ + z_ * z_), 2 * (y_ * z_ - w_ * x_),
    2 * (x_ * z_ - w_ * y_), 2 * (y_ * z_ + w_ * x_), 1 - 2 * (x_ * x_ + y_ * y_),
], axis=-1).reshape(-1, 3, 3)
cov = jnp.einsum("nij,nj,nkj->nik", R, scales**2, R)
sh = jax.random.normal(ks[3], (N, 3, 25)) * jnp.concatenate(
    [jnp.full((1,), 0.6), jnp.full((24,), 0.05)])[None, None, :]
op_hi = jax.random.uniform(ks[4], (N,), minval=0.5, maxval=0.99)
op_lo = jax.random.uniform(ks[5], (N,), minval=0.02, maxval=0.3)
opac = jnp.where(jax.random.uniform(ks[6], (N,)) < 0.8, op_hi, op_lo)

V = 2
ext = jnp.broadcast_to(jnp.eye(4), (V, 4, 4))
ext = ext.at[:, 0, 3].set(jnp.array([0.1, 0.4]))
ext = ext.at[:, 2, 3].set(jnp.array([-0.1, -0.3]))
Kmat = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
Ks = jnp.broadcast_to(Kmat, (V, 3, 3))
bg = jnp.zeros(3)

# ---- oracle (exact, f32, chunked) ----
oracle = []
for v in range(V):
    vm = rigid_inverse(ext[v])
    c, d, a = jax.jit(
        lambda vm: render_view_bruteforce_chunked(
            means, cov, sh, opac, vm, Kmat, (H, W), bg, 4, px_chunk=256)
    )(vm)
    sync(c)
    oracle.append(np.asarray(c))
    print(f"oracle view {v} done", flush=True)
oracle = np.stack(oracle)

# ---- sweep ----
results = []
for dup in (2, 3, 4, 6):
    for K_ in (256, 512, 1024, 2048):
        cfg = RasterizeConfig(dup_hw=(dup, dup), max_per_tile=K_)
        c, d, a = jax.jit(
            lambda e, Km: render(means, cov, sh, opac, e, Km, (H, W), bg, 4,
                                 cfg=cfg)
        )(ext, Ks)
        sync(c)
        err = np.asarray(c) - oracle
        mse = float(np.mean(err ** 2))
        psnr = float(-10 * np.log10(max(mse, 1e-12)))
        t = device_time(
            lambda m: render(m, cov, sh, opac, ext, Ks, (H, W), bg, 4,
                             cfg=cfg), means, iters=10, base=2)
        stats = jax.jit(
            lambda vm: coverage_stats(means, cov, sh, opac, vm, Kmat,
                                      (H, W), 4, cfg=cfg)
        )(rigid_inverse(ext[0]))
        row = {
            "dup_hw": dup, "K": K_,
            "psnr_vs_oracle": round(psnr, 2),
            "max_abs_err": round(float(np.abs(err).max()), 5),
            "ms_per_view": round(t / V * 1e3, 3),
            "truncated_frac": round(float(stats["truncated_frac"]), 4),
            "tile_overflow_frac": round(float(stats["tile_overflow_frac"]), 4),
            "tile_occupancy_mean": round(float(stats["tile_occupancy_mean"]), 1),
        }
        results.append(row)
        print(row, flush=True)

out = pathlib.Path("/root/repo/outputs/rasterizer_caps")
out.mkdir(parents=True, exist_ok=True)
with open(out / "caps_study_synthetic.json", "w") as f:
    json.dump({"scene": "dense pixel-aligned 524k (worst case)",
               "n_gaussians": int(N), "views": V, "image": [H, W],
               "oracle": "render_view_bruteforce_chunked f32",
               "results": results}, f, indent=2)
print("wrote outputs/rasterizer_caps/caps_study_synthetic.json")
