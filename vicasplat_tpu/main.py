"""Train/test CLI: `python -m vicasplat_tpu.main +experiment=re10k_8view
[mode=test] [key=value ...]`.

Parity target: reference src/main.py (Hydra train()) — config composition,
encoder/decoder construction, optional pretrained-weight loading, training
loop with checkpointing + curriculum step publishing, or test-mode evaluation
over the dataset's evaluation index.

TPU orchestration: one JAX process per host, 1-D data mesh over local chips,
batch sharded / params replicated, host-side threaded input pipeline.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_all(cfg):
    from .models import init_vicasplat
    from .training import TrainConfig, make_train_step
    from .training.optimizer import make_optimizer, OptimizerConfig
    import dataclasses

    opt_cfg = dataclasses.replace(
        cfg.optimizer,
        cosine_annealing=cfg.train.lr_cosine_annealing or cfg.optimizer.cosine_annealing,
        max_steps=cfg.trainer.max_steps if cfg.trainer.max_steps > 0 else cfg.optimizer.max_steps,
        gradient_clip_val=cfg.trainer.gradient_clip_val,
        new_param_keywords=tuple(cfg.train.new_param_keywords),
    )
    train_cfg = TrainConfig(
        model=cfg.encoder,
        decoder=cfg.decoder,
        optimizer=opt_cfg,
        mse=cfg.loss.mse or None,
        camera=cfg.loss.camera,
        dtype="bfloat16" if cfg.trainer.precision == "bfloat16" else "float32",
        remat=cfg.train.gradient_checkpointing,
        remat_policy=cfg.train.remat_policy,
        distill_weight=cfg.train.distill_weight,
        distill_only_steps=cfg.train.distill_only_steps,
        distill_max_steps=cfg.train.distill_max_steps,
        accumulate_steps=cfg.train.accumulate_grad_batches,
    )
    if cfg.loss.lpips is not None:
        train_cfg = dataclasses.replace(train_cfg, lpips=cfg.loss.lpips)
    params = init_vicasplat(jax.random.PRNGKey(cfg.seed), cfg.encoder)
    if cfg.checkpointing.load:
        from .utils.checkpointing import load_weights

        print(f"loading weights from {cfg.checkpointing.load}")
        params = load_weights(cfg.checkpointing.load, template=params)
    optimizer = make_optimizer(params, opt_cfg)
    return train_cfg, params, optimizer


def train(cfg):
    from .data import DataModule
    from .parallel import make_mesh, replicate, shard_batch
    from .training import make_train_step
    from .training.step import pick_phase
    from .utils.checkpointing import CheckpointManager
    from .utils.step_tracker import StepTracker

    # fix TrainConfig losses: mse required
    import dataclasses
    train_cfg, params, optimizer = build_all(cfg)
    if cfg.loss.mse is not None:
        train_cfg = dataclasses.replace(train_cfg, mse=cfg.loss.mse)
    if cfg.loss.camera is not None:
        train_cfg = dataclasses.replace(train_cfg, camera=cfg.loss.camera)

    step_tracker = StepTracker()
    dm = DataModule(cfg.dataset, cfg.data_loader, step_tracker,
                    global_rank=jax.process_index())
    ckpt = CheckpointManager(
        cfg.checkpointing.output_dir,
        every_n_steps=cfg.checkpointing.every_n_train_steps,
        keep=cfg.checkpointing.save_top_k,
        async_save=cfg.checkpointing.async_save,
    )

    # data-parallel mesh: use the largest device count that divides the
    # global batch (a 2-example batch can't shard over 8 devices)
    batch_size = dm.train_batch_size()
    n_dev = len(jax.devices())
    while batch_size % n_dev != 0:
        n_dev -= 1
    if n_dev < len(jax.devices()):
        print(f"note: batch {batch_size} shards over {n_dev}/"
              f"{len(jax.devices())} devices")
    mesh = make_mesh(n_dev)
    opt_state = optimizer.init(params)

    start_step = 0
    if cfg.checkpointing.resume:
        from .utils.checkpointing import restore_train_state

        latest = ckpt.latest()
        if latest is not None:
            # restore straight onto the mesh (replicated): orbax places each
            # leaf per-device, no host bounce; the replicate() below is then
            # a no-op device_put
            from jax.sharding import NamedSharding, PartitionSpec

            params, opt_state, start_step = restore_train_state(
                latest, params, opt_state,
                sharding=NamedSharding(mesh, PartitionSpec()),
            )
            print(f"resumed full train state from {latest} at step {start_step}")
    lpips_fn = _maybe_lpips(cfg)
    teacher_fn = _maybe_distiller(cfg)
    step_fn = jax.jit(
        make_train_step(train_cfg, optimizer, lpips_fn=lpips_fn,
                        teacher_fn=teacher_fn, mesh=mesh),
        donate_argnums=(0, 1),
        static_argnames=("phase",),
    )
    from .utils.loggers import make_logger

    writer = make_logger(cfg)

    def save_ckpt(step):
        import numpy as np

        if cfg.checkpointing.save_weights_only:
            ckpt.save(step, jax.device_get(params))
        else:
            ckpt.save(
                step,
                jax.device_get(params),
                opt_state=jax.device_get(opt_state),
                extra={"step": np.asarray(step, np.int64)},
            )

    max_steps = cfg.trainer.max_steps if cfg.trainer.max_steps > 0 else 10**9
    global_step = start_step
    step_tracker.set_step(global_step)
    t_last = time.perf_counter()
    with mesh:
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        profiling = False
        while global_step < max_steps:
            loader = dm.train_dataloader()
            for batch in loader:
                batch = {k: v for k, v in batch.items() if k != "scene"}
                batch = shard_batch(mesh, batch)
                phase = pick_phase(
                    train_cfg, global_step, teacher_fn is not None
                )
                if (cfg.trainer.profile_dir and not profiling
                        and global_step == cfg.trainer.profile_start):
                    jax.profiler.start_trace(cfg.trainer.profile_dir)
                    profiling = True
                params, opt_state, logs = step_fn(
                    params, opt_state, batch, global_step, phase=phase
                )
                global_step += 1
                step_tracker.set_step(global_step)
                if (profiling and global_step
                        >= cfg.trainer.profile_start
                        + cfg.trainer.profile_steps):
                    jax.block_until_ready(params)
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"profiler trace ({cfg.trainer.profile_steps} "
                          f"steps) -> {cfg.trainer.profile_dir}")
                if global_step % cfg.train.print_log_every_n_steps == 0:
                    logs = jax.device_get(logs)
                    dt = time.perf_counter() - t_last
                    t_last = time.perf_counter()
                    print(
                        f"step {global_step} | loss {logs['loss']:.4f} | "
                        f"psnr {logs['psnr']:.2f} | "
                        f"{cfg.train.print_log_every_n_steps / dt:.2f} it/s",
                        flush=True,
                    )
                    if writer is not None:
                        for k, v in logs.items():
                            writer.add_scalar(f"train/{k}", float(v), global_step)
                        # LR monitor (reference: Lightning LearningRateMonitor,
                        # src/main.py:77): evaluate the schedule host-side
                        from .training.optimizer import make_schedule

                        writer.add_scalar(
                            "train/lr",
                            float(make_schedule(cfg.optimizer)(global_step)),
                            global_step,
                        )
                if ckpt.should_save(global_step):
                    save_ckpt(global_step)
                if (
                    cfg.trainer.val_check_interval > 0
                    and global_step % cfg.trainer.val_check_interval == 0
                ):
                    try:
                        _validation_visuals(cfg, params, dm, global_step, writer)
                    except StopIteration:
                        pass
                if global_step >= max_steps:
                    break
            # stop prefetch threads left mid-epoch by the max_steps break
            loader.close()
    save_ckpt(global_step)
    ckpt.finalize()
    if writer is not None:
        writer.close()
    print("training done")


def _validation_visuals(cfg, params, dm, global_step, writer):
    """Render one val example and save the reference's validation visuals
    (model_wrapper.py:523-681): context/GT/render/depth comparison grid,
    orthographic scene projections, a camera-trajectory figure, and an
    interpolated-trajectory video."""
    import pathlib

    import numpy as np

    from .decoder.splatting import decoder_forward
    from .models import vicasplat_forward
    from .utils.image_io import save_image, save_video, vis_depth_map
    from .visualization.drawing import draw_cameras_figure
    from .visualization.layout import add_label, hcat, vcat
    from .visualization.validation_in_3d import render_projections
    from .visualization.video_render import render_video_interpolation

    batch = next(iter(dm.val_dataloader()))
    ctx, tgt = batch["context"], batch["target"]
    h, w = tgt["image"].shape[-3:-1]
    out = vicasplat_forward(
        params, cfg.encoder, dict(ctx, image=ctx["image"] * 2 - 1),
        global_step, dtype=jnp.bfloat16,
    )
    rendered = decoder_forward(
        cfg.decoder, out["gaussians"], tgt["extrinsics"], tgt["intrinsics"],
        tgt["near"], tgt["far"], (h, w),
    )
    outdir = pathlib.Path(cfg.output_dir) / "val" / f"step_{global_step:07d}"

    # --- comparison grid: context / GT / render / depth colormap ---
    n = min(4, tgt["image"].shape[1])
    nc = min(4, ctx["image"].shape[1])
    ctx_row = hcat(*[np.asarray(ctx["image"][0, i]) for i in range(nc)])
    gt_row = hcat(*[np.asarray(tgt["image"][0, i]) for i in range(n)])
    pr_row = hcat(*[np.asarray(rendered.color[0, i]) for i in range(n)])
    dp_row = hcat(*[vis_depth_map(np.asarray(rendered.depth[0, i]))
                    for i in range(n)])
    grid = vcat(add_label(ctx_row, "context"),
                add_label(gt_row, "target (GT)"),
                add_label(pr_row, "rendered"),
                add_label(dp_row, "depth"))
    save_image(grid, outdir / "comparison.png")
    if writer is not None:
        writer.add_image(
            "val/comparison", np.clip(grid, 0, 1).transpose(2, 0, 1),
            global_step,
        )

    # --- orthographic projections of the Gaussian scene ---
    try:
        proj = render_projections(out["gaussians"], dec_cfg=cfg.decoder)
        save_image(hcat(*[p for p in proj]), outdir / "projections.png")
    except Exception as e:  # projections are best-effort observability
        print(f"val projections skipped: {e}")

    # --- predicted-vs-GT camera trajectory figure ---
    try:
        fig = draw_cameras_figure(
            np.asarray(ctx["extrinsics"][0]),
            np.asarray(out["gaussian_camera_extrins"][0]),
        )
        save_image(fig, outdir / "cameras.png")
    except Exception as e:
        print(f"val camera figure skipped: {e}")

    # --- interpolated-trajectory video along predicted poses ---
    try:
        frames = render_video_interpolation(
            out["gaussians"], out["gaussian_camera_extrins"][0],
            ctx["intrinsics"][0], (h, w), steps_per_segment=6,
            dec_cfg=cfg.decoder,
        )
        save_video(frames, outdir / "interpolation.mp4", fps=15)
    except Exception as e:
        print(f"val video skipped: {e}")


def _make_tb_writer(cfg):
    """Back-compat alias; logger selection lives in utils/loggers.py
    (wandb when configured+available, offline-JSONL wandb fallback, else
    TensorBoard — reference src/main.py:66-83)."""
    from .utils.loggers import make_logger

    return make_logger(cfg)


def _maybe_distiller(cfg):
    """Frozen DUSt3R/MASt3R teacher for the distillation stage (reference
    src/model/distiller/__init__.py:9-23). Requires a converted teacher
    checkpoint at checkpoints/<distiller>.ckpt or $DISTILLER_CKPT."""
    if not cfg.train.distiller:
        return None
    import os
    import pathlib

    import jax.numpy as jnp

    from .models.dust3r import Dust3RConfig, dust3r_forward, init_dust3r
    from .utils.ckpt_convert import convert_dust3r_state_dict

    path = os.environ.get(
        "DISTILLER_CKPT", f"checkpoints/{cfg.train.distiller}.ckpt"
    )
    d_cfg = Dust3RConfig(img_size=cfg.encoder.backbone.img_size)
    if pathlib.Path(path).exists():
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt)
        sd = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        t_params = convert_dust3r_state_dict(sd)
        print(f"loaded distiller weights from {path}")
    else:
        print(f"WARNING: distiller checkpoint {path} missing — "
              "using random teacher weights (distillation will be meaningless)")
        t_params = init_dust3r(jax.random.PRNGKey(1), d_cfg)
    t_params = jax.lax.stop_gradient(t_params)

    def teacher_fn(img1, img2):
        out = dust3r_forward(t_params, d_cfg, img1, img2, dtype=jnp.bfloat16)
        return jax.lax.stop_gradient(out)

    return teacher_fn


def _maybe_lpips(cfg):
    if cfg.loss.lpips is None:
        return None
    try:
        from .loss.lpips import make_lpips_fn

        return make_lpips_fn()
    except Exception as e:  # weights unavailable in this environment
        print(f"lpips unavailable ({e}); continuing without perceptual loss")
        return None


def _nan_summary(scored, key):
    """(nanmean, n_valid) of a per-scene metric, skipping missing/NaN."""
    vals = np.asarray(
        [x[key] for x in scored if key in x and x[key] is not None],
        np.float64,
    )
    vals = vals[np.isfinite(vals)]
    return (float(vals.mean()) if len(vals) else float("nan")), int(len(vals))


def test(cfg):
    from .data import DataModule
    from .evaluation.nvs_eval import (
        EvalConfig,
        evaluate_scene,
        make_pose_align_step,
        save_scene_outputs,
    )
    from .models import init_vicasplat, vicasplat_forward
    from .decoder.splatting import decoder_forward
    from .utils.benchmarker import Benchmarker
    from .utils.checkpointing import load_weights

    params = init_vicasplat(jax.random.PRNGKey(cfg.seed), cfg.encoder)
    if cfg.checkpointing.load:
        if cfg.test.use_ema:
            # EMA rides the optimizer state (optimizer.py _track_param_ema);
            # rebuild the optimizer to restore the full state and pull it out
            from .training.optimizer import get_ema_params
            from .utils.checkpointing import restore_train_state

            _, p0, optimizer = build_all(cfg)
            p, opt_state, _ = restore_train_state(
                cfg.checkpointing.load, p0, optimizer.init(p0))
            ema = get_ema_params(opt_state)
            if ema is None:
                print("WARNING: test.use_ema=true but the checkpoint has no "
                      "EMA state (weights-only, or trained with "
                      "ema_decay=0); using raw weights")
                params = p
            else:
                params = ema
        else:
            params = load_weights(cfg.checkpointing.load, template=params)

    eval_cfg = EvalConfig(
        output_path=cfg.test.output_path,
        align_pose=cfg.test.align_pose,
        pose_align_steps=cfg.test.pose_align_steps,
        rot_opt_lr=cfg.test.rot_opt_lr,
        trans_opt_lr=cfg.test.trans_opt_lr,
        compute_scores=cfg.test.compute_scores,
        save_image=cfg.test.save_image,
        save_video=cfg.test.save_video,
        save_compare=cfg.test.save_compare,
        save_gs=cfg.test.save_gs,
    )
    dm = DataModule(cfg.dataset, cfg.data_loader, None)
    bench = Benchmarker()
    h = w = cfg.encoder.backbone.img_size
    encode_fn = jax.jit(
        lambda p, c: vicasplat_forward(
            p, cfg.encoder, dict(c, image=c["image"] * 2 - 1), dtype=jnp.bfloat16
        )
    )
    render_fn = jax.jit(
        lambda g, t, rot, trans: decoder_forward(
            cfg.decoder, g, t["extrinsics"], t["intrinsics"], t["near"],
            t["far"], (h, w), cam_rot_delta=rot, cam_trans_delta=trans,
        )
    )
    lpips_fn = _maybe_lpips(cfg)
    align_fn = (
        make_pose_align_step(cfg.encoder, cfg.decoder, eval_cfg, (h, w),
                             loss_cfg=cfg.loss, lpips_fn=lpips_fn)
        if eval_cfg.align_pose and eval_cfg.pose_align_steps > 0
        else None
    )
    results = []
    for full_batch in dm.test_dataloader():
        # score per scene even if the loader batches >1 (scores would
        # otherwise silently drop examples past the first)
        n_ex = full_batch["context"]["image"].shape[0]
        for i in range(n_ex):
            batch = {
                k: (jax.tree.map(lambda x: x[i: i + 1], v)
                    if isinstance(v, dict) else v[i: i + 1])
                for k, v in full_batch.items()
            }
            r = evaluate_scene(
                params, cfg.encoder, cfg.decoder, eval_cfg, batch,
                encode_fn=encode_fn, render_fn=render_fn, align_fn=align_fn,
                benchmarker=bench, lpips_fn=lpips_fn,
            )
            save_scene_outputs(r, batch, eval_cfg, cfg.encoder)
            results.append(
                {k: v for k, v in r.items() if not k.startswith("_")}
            )
        scored = [x for x in results if "psnr" in x]
        if scored:
            print(
                f"[{len(results)}] {r['scene']}: "
                + " ".join(
                    f"{k}={_nan_summary(scored, k)[0]:.3f}"
                    for k in ("psnr", "ssim", "ate")
                    if any(k in x for x in scored)
                ),
                flush=True,
            )

    import json
    import pathlib

    out = pathlib.Path(eval_cfg.output_path)
    out.mkdir(parents=True, exist_ok=True)
    scored = [x for x in results if "psnr" in x]
    # nanmean + n_valid per metric: a metric skipped on a degenerate scene
    # (metrics.py returns None) must not poison the committed summary
    summary, n_valid = {}, {}
    keys = sorted({k for x in scored for k in x
                   if isinstance(x[k], (int, float))})
    for k in keys:
        mean, n = _nan_summary(scored, k)
        if n:
            summary[k] = mean
            n_valid[k] = n
    if summary:
        summary["n_scenes"] = len(scored)
        summary["n_valid"] = n_valid
    with open(out / "scores_all_avg.json", "w") as f:
        json.dump(summary, f, indent=2)
    bench.dump(out / "benchmark.json")
    bench.dump_memory(out / "peak_memory.json")
    print("summary:", summary)


def main(argv=None):
    from .utils.config import parse_cli

    argv = sys.argv[1:] if argv is None else argv
    cfg = parse_cli(argv)
    np.random.seed(cfg.seed + jax.process_index())
    if cfg.mode == "train":
        train(cfg)
    elif cfg.mode == "test":
        test(cfg)
    else:
        raise ValueError(cfg.mode)


if __name__ == "__main__":
    main()
