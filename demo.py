"""Inference demo CLI: a folder of frames -> Gaussians + poses -> interpolated
trajectory video + PLY + transforms.json.

Parity target: reference demo.py (gradio app): load_images (resize short
side to 256 + center crop, :85-132), inference (:180-202),
render_video_interpolation (:204-243), exports (:246-300). Gradio/trimesh
are not available in this environment, so this is a CLI with identical
pipeline semantics; for an interactive surface use
`python -m vicasplat_tpu.serving` (HTTP) or
`visualization/viewer_server.py` (WebGL scene viewer).

Usage:
  python demo.py --image_dir examples/scene --ckpt re10k_8view.ckpt \
      --output_dir outputs/demo [--fov 60]
"""
import argparse
import json
import pathlib
import time

import numpy as np


def load_images(image_dir: pathlib.Path, size: int = 256) -> np.ndarray:
    """Resize short side to `size`, center-crop square (reference
    demo.py:85-132). Returns (T, size, size, 3) float32 [0,1]."""
    from PIL import Image

    paths = sorted(
        p for p in image_dir.iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    if not paths:
        raise FileNotFoundError(f"no images in {image_dir}")
    out = []
    for p in paths:
        img = Image.open(p).convert("RGB")
        w, h = img.size
        scale = size / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)), Image.LANCZOS)
        w, h = img.size
        left, top = (w - size) // 2, (h - size) // 2
        img = img.crop((left, top, left + size, top + size))
        out.append(np.asarray(img, np.float32) / 255.0)
    return np.stack(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--ckpt", default=None, help="torch .ckpt or orbax dir")
    ap.add_argument("--output_dir", default="outputs/demo")
    ap.add_argument("--fov", type=float, default=60.0, help="assumed FoV (deg)")
    ap.add_argument("--steps_per_segment", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--window", type=int, default=8,
                    help="clip length per model pass; longer videos stream "
                         "through sliding windows (streaming.py)")
    ap.add_argument("--overlap", type=int, default=2,
                    help="shared frames between consecutive windows "
                         "(>=2 recommended so window scale is observable)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vicasplat_tpu.decoder.splatting import (
        DecoderSplattingConfig,
        decoder_forward,
    )
    from vicasplat_tpu.models import (
        GaussianAdapterConfig,
        VicaNetConfig,
        VicaSplatConfig,
        init_vicasplat,
        vicasplat_forward,
    )
    from vicasplat_tpu.utils.image_io import save_video
    from vicasplat_tpu.utils.ply import export_ply
    from vicasplat_tpu.visualization.camera_trajectory import (
        interpolate_trajectory,
    )

    images = load_images(pathlib.Path(args.image_dir), args.size)
    T = images.shape[0]
    print(f"loaded {T} frames at {args.size}x{args.size}")

    cfg = VicaSplatConfig(
        backbone=VicaNetConfig(img_size=args.size),
        gaussian_adapter=GaussianAdapterConfig(sh_degree=4),
    )
    params = init_vicasplat(jax.random.PRNGKey(0), cfg)
    if args.ckpt:
        from vicasplat_tpu.utils.checkpointing import load_weights

        params = load_weights(args.ckpt, template=params)
        print(f"loaded weights from {args.ckpt}")
    else:
        print("WARNING: no checkpoint given — running with random weights")

    fov = np.radians(args.fov)
    f = 0.5 / np.tan(fov / 2)
    K = np.array([[f, 0, 0.5], [0, f, 0.5], [0, 0, 1.0]], np.float32)

    t0 = time.perf_counter()
    if T > args.window:
        # long video: sliding-window streaming with scale-aligned pose
        # chaining (streaming.py) — each window reuses one compiled program
        from vicasplat_tpu.serving import InferenceEngine
        from vicasplat_tpu.streaming import reconstruct_video

        eng = InferenceEngine(cfg, params=params, dtype=jnp.bfloat16)
        scene = reconstruct_video(
            eng, images, np.broadcast_to(K, (T, 3, 3)),
            window=args.window, overlap=args.overlap)
        g_stream = jax.tree.map(lambda x: x[None], scene.gaussians)
        out = {"gaussians": g_stream,
               "gaussian_centers": g_stream.means}
        poses = scene.poses.astype(np.float32)
        print(f"streamed {len(scene.window_scales)} windows "
              f"(window {args.window}, overlap {args.overlap}); "
              f"scales {np.round(scene.window_scales, 3).tolist()}")
    else:
        batch = {
            "image": jnp.asarray(images)[None] * 2.0 - 1.0,
            "intrinsics": jnp.broadcast_to(jnp.asarray(K), (1, T, 3, 3)),
        }
        out = jax.jit(
            lambda p, b: vicasplat_forward(p, cfg, b, dtype=jnp.bfloat16)
        )(params, batch)
        poses = jax.device_get(out["gaussian_camera_extrins"])[0]
    print(f"inference: {time.perf_counter() - t0:.2f}s "
          f"(includes compile on first run)")

    out_dir = pathlib.Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # exports
    g = out["gaussians"]
    n_kept = export_ply(
        np.asarray(g.means).reshape(-1, 3),
        np.asarray(g.scales).reshape(-1, 3),
        np.asarray(g.rotations).reshape(-1, 4),
        np.asarray(g.harmonics).reshape(-1, *g.harmonics.shape[-2:]),
        np.asarray(g.opacities).reshape(-1),
        out_dir / "gaussians.ply",
    )
    transforms = {
        "camera_model": "PINHOLE",
        "fl_x": float(K[0, 0] * args.size), "fl_y": float(K[1, 1] * args.size),
        "cx": args.size / 2, "cy": args.size / 2,
        "w": args.size, "h": args.size,
        "frames": [
            {"file_path": f"{i:03d}", "transform_matrix": poses[i].tolist()}
            for i in range(T)
        ],
    }
    with open(out_dir / "transforms.json", "w") as fjson:
        json.dump(transforms, fjson, indent=2)

    # colored-centers + camera-frusta GLB (reference demo.py:135-160; no
    # trimesh here, visualization/glb.py writes the container directly)
    from vicasplat_tpu.visualization.glb import write_glb

    write_glb(
        out_dir / "xyz_and_camera.glb",
        np.asarray(out["gaussian_centers"]).reshape(-1, 3),
        images.reshape(-1, 3),
        camera_poses=poses,
        focal=float(K[0, 0]),
        cam_size=0.05,
    )

    # interpolated trajectory video
    traj = interpolate_trajectory(jnp.asarray(poses), args.steps_per_segment)
    V = traj.shape[0]
    dec_cfg = DecoderSplattingConfig()

    # warn if the rasterizer's static caps truncate this scene
    from vicasplat_tpu.decoder.splatting import coverage_report

    coverage_report(
        dec_cfg, g, traj[None],
        jnp.broadcast_to(jnp.asarray(K), (1, V, 3, 3)), (args.size, args.size),
        tag=pathlib.Path(args.image_dir).name,
    )
    render_args = (
        g, traj[None], jnp.broadcast_to(jnp.asarray(K), (1, V, 3, 3)),
        jnp.full((1, V), 0.05), jnp.full((1, V), 100.0),
        (args.size, args.size),
    )
    if len(jax.devices()) > 1:
        # multi-chip: shard the trajectory's view axis over the mesh
        # (parallel/view_parallel.py) — linear speedup, no communication
        from vicasplat_tpu.parallel import (
            decoder_forward_view_sharded, make_mesh,
        )

        rendered = decoder_forward_view_sharded(
            dec_cfg, *render_args, mesh=make_mesh()
        )
    else:
        rendered = decoder_forward(dec_cfg, *render_args)
    save_video(np.asarray(rendered.color[0]), out_dir / "render.mp4")
    print(f"wrote {out_dir}/gaussians.ply ({n_kept} splats), transforms.json, "
          f"xyz_and_camera.glb, render.mp4 ({V} frames)")


if __name__ == "__main__":
    main()
