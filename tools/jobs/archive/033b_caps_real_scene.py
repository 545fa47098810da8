"""Rasterizer-cap quality on REAL trained-checkpoint Gaussians (VERDICT r3
#3, second half: "BOTH the pixel-aligned synthetic scene and a real overfit
checkpoint's Gaussians").

Loads the 30k-step held-out overfit's saved Gaussians (job 030, scene
6c99592614256138: 8x128^2 = 131k splats with trained scales/opacities),
renders 3 views (both held-out frames + frame 0) under a (dup_hw, K) grid,
and reports PSNR vs the exact bruteforce oracle plus what the adaptive
selector (select_raster_config) picks for this scene. Output:
outputs/rasterizer_caps/caps_study_real_scene.json.
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
    RasterizeConfig, coverage_stats, render, select_raster_config,
)
from vicasplat_tpu.ops.rasterize.reference import render_view_bruteforce_chunked

scene = "6c99592614256138"
z = np.load(f"/root/repo/outputs/real_scene_overfit/{scene}_holdout/"
            "gaussians_full.npz")
means = jnp.asarray(z["means"].reshape(-1, 3))
scales = jnp.asarray(z["scales"].reshape(-1, 3))
quat = jnp.asarray(z["rotations"].reshape(-1, 4))
sh = jnp.asarray(z["harmonics"].reshape(-1, 3, 9))
opac = jnp.asarray(z["opacities"].reshape(-1))
N = means.shape[0]

quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
w_, x_, y_, z_ = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
R = jnp.stack([
    1 - 2 * (y_ * y_ + z_ * z_), 2 * (x_ * y_ - w_ * z_), 2 * (x_ * z_ + w_ * y_),
    2 * (x_ * y_ + w_ * z_), 1 - 2 * (x_ * x_ + z_ * z_), 2 * (y_ * z_ - w_ * x_),
    2 * (x_ * z_ - w_ * y_), 2 * (y_ * z_ + w_ * x_), 1 - 2 * (x_ * x_ + y_ * y_),
], axis=-1).reshape(-1, 3, 3)
cov = jnp.einsum("nij,nj,nkj->nik", R, scales**2, R)

H = W = int(np.sqrt(z["means"].shape[1] * z["means"].shape[2]))
views = [2, 5, 0]  # both held-out frames + one training frame
ext = jnp.asarray(z["extrinsics"][views])
Kmat = jnp.asarray(z["intrinsics"])
Ks = jnp.broadcast_to(Kmat, (len(views), 3, 3))
bg = jnp.zeros(3)
DEG = 2
print(f"scene {scene}: N={N}, {H}x{W}, views {views}", flush=True)

oracle = []
for v in range(len(views)):
    vm = rigid_inverse(ext[v])
    c, d, a = jax.jit(
        lambda vm: render_view_bruteforce_chunked(
            means, cov, sh, opac, vm, Kmat, (H, W), bg, DEG, px_chunk=256)
    )(vm)
    sync(c)
    oracle.append(np.asarray(c))
    print(f"oracle view {views[v]} done", flush=True)
oracle = np.stack(oracle)

results = []
for dup in (2, 3):
    for K_ in (128, 256, 512, 1024):
        cfg = RasterizeConfig(dup_hw=(dup, dup), max_per_tile=K_)
        c, d, a = jax.jit(
            lambda e, Km: render(means, cov, sh, opac, e, Km, (H, W), bg,
                                 DEG, cfg=cfg)
        )(ext, Ks)
        sync(c)
        err = np.asarray(c) - oracle
        mse = float(np.mean(err ** 2))
        psnr = float(-10 * np.log10(max(mse, 1e-12)))
        t = device_time(
            lambda m: render(m, cov, sh, opac, ext, Ks, (H, W), bg, DEG,
                             cfg=cfg), means, iters=10, base=2)
        stats = jax.jit(
            lambda vm: coverage_stats(means, cov, sh, opac, vm, Kmat,
                                      (H, W), DEG, cfg=cfg)
        )(rigid_inverse(ext[0]))
        row = {
            "dup_hw": dup, "K": K_,
            "psnr_vs_oracle": round(psnr, 2),
            "max_abs_err": round(float(np.abs(err).max()), 5),
            "ms_per_view": round(t / len(views) * 1e3, 3),
            "truncated_frac": round(float(stats["truncated_frac"]), 4),
            "tile_overflow_frac": round(float(stats["tile_overflow_frac"]), 4),
            "tile_occupancy_mean": round(float(stats["tile_occupancy_mean"]), 1),
        }
        results.append(row)
        print(row, flush=True)

sel = select_raster_config(means, cov, sh, opac, rigid_inverse(ext[0]),
                           Kmat, (H, W), DEG)
sel_row = {"dup_hw": sel.dup_hw, "max_per_tile": sel.max_per_tile}
print("adaptive selection:", sel_row, flush=True)

out = pathlib.Path("/root/repo/outputs/rasterizer_caps")
out.mkdir(parents=True, exist_ok=True)
with open(out / "caps_study_real_scene.json", "w") as f:
    json.dump({"scene": f"trained overfit ckpt {scene} (job 030)",
               "n_gaussians": int(N), "views": views, "image": [H, W],
               "oracle": "render_view_bruteforce_chunked f32",
               "adaptive_selection": sel_row,
               "results": results}, f, indent=2)
print("wrote outputs/rasterizer_caps/caps_study_real_scene.json")
