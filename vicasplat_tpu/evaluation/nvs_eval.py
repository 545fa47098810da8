"""Novel-view-synthesis test harness: per-scene encode -> (optional gradient
pose alignment) -> render target views -> PSNR/SSIM/LPIPS + ATE/RPE ->
save images/videos/ply/transforms.json.

Parity target: reference src/model/model_wrapper.py:323-521 (test_step +
test_step_align + on_test_end) and src/evaluation/pose_evaluator.py.
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..decoder.splatting import DecoderSplattingConfig, decoder_forward
from ..models.vicasplat import VicaSplatConfig, vicasplat_forward
from ..utils.benchmarker import Benchmarker
from ..utils.image_io import hcat, save_image, save_video, to_uint8
from ..utils.ply import export_ply
from .metrics import camera_eval_metrics, compute_psnr, compute_ssim


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    output_path: str = "outputs/eval_results"
    align_pose: bool = True
    pose_align_steps: int = 100
    rot_opt_lr: float = 0.005
    trans_opt_lr: float = 0.005
    compute_scores: bool = True
    save_image: bool = True
    save_video: bool = False
    save_compare: bool = True
    save_gs: bool = False
    # rasterizer coverage diagnostics per scene: warn when the static-shape
    # caps (dup_hw / max_per_tile) measurably truncate the scene — the CUDA
    # reference has no such caps, so this is our correctness guard
    coverage_check: bool = True


def make_align_objective(loss_cfg=None, lpips_fn=None):
    """(image_loss(pred, target), mode) for test-time pose alignment.

    Reference protocol (model_wrapper.py:485-489): the experiment's
    configured losses minus the camera loss — MSE + LPIPS for re10k_8view.
    Modes:
      - "mse" / "mse+lpips": the protocol objective from `loss_cfg`
        (LossWeightsConfig) with the configured weights.
      - "ssim_fallback": no loss_cfg, or LPIPS is configured but its VGG
        weights are unobtainable (lpips_fn None) — the perceptual term
        would silently vanish, so the documented stand-in objective
        0.8*MSE + 0.2*(1-SSIM) is used instead."""
    from ..loss.ssim import ssim

    use_protocol = loss_cfg is not None and loss_cfg.mse is not None
    if use_protocol and loss_cfg.lpips is not None and lpips_fn is None:
        use_protocol = False
    if use_protocol:
        lpips_weight = (
            loss_cfg.lpips.weight if loss_cfg.lpips is not None else 0.0
        )
        mse_weight = loss_cfg.mse.weight

        def image_loss(pred, target):
            total = mse_weight * ((pred - target) ** 2).mean()
            if lpips_weight > 0.0:
                total = total + lpips_weight * lpips_fn(pred, target)
            return total

        return image_loss, ("mse+lpips" if lpips_weight > 0.0 else "mse")

    def image_loss(pred, target):
        mse = ((pred - target) ** 2).mean()
        return 0.8 * mse + 0.2 * (1.0 - ssim(pred, target))

    return image_loss, "ssim_fallback"


def make_pose_align_step(model_cfg: VicaSplatConfig,
                         dec_cfg: DecoderSplattingConfig, eval_cfg: EvalConfig,
                         image_shape, loss_cfg=None, lpips_fn=None):
    """Test-time gradient pose alignment: optimize per-target-view SE(3)
    deltas by rendering against the target (reference
    model_wrapper.py:442-513).

    The objective follows the reference protocol (model_wrapper.py:485-489):
    the experiment's configured losses minus the camera loss — i.e. for
    re10k_8view, weighted MSE + LPIPS. `loss_cfg` is the LossWeightsConfig;
    `lpips_fn` the perceptual metric when VGG weights are available. With no
    loss_cfg (or when LPIPS is configured but its weights are unobtainable
    and MSE alone would under-constrain), the documented fallback objective
    is 0.8*MSE + 0.2*(1-SSIM) — SSIM standing in for the perceptual term."""
    image_loss, _mode = make_align_objective(loss_cfg, lpips_fn)

    def loss_fn(deltas, gaussians, tgt):
        rendered = decoder_forward(
            dec_cfg, gaussians, tgt["extrinsics"], tgt["intrinsics"],
            tgt["near"], tgt["far"], image_shape,
            cam_rot_delta=deltas["rot"], cam_trans_delta=deltas["trans"],
        )
        return image_loss(rendered.color, tgt["image"])

    opt = optax.multi_transform(
        {
            "rot": optax.adam(eval_cfg.rot_opt_lr),
            "trans": optax.adam(eval_cfg.trans_opt_lr),
        },
        {"rot": "rot", "trans": "trans"},
    )

    @jax.jit
    def align(gaussians, tgt):
        b, v = tgt["extrinsics"].shape[:2]
        deltas = {"rot": jnp.zeros((b, v, 3)), "trans": jnp.zeros((b, v, 3))}
        state = opt.init(deltas)

        def body(carry, _):
            deltas, state = carry
            grads = jax.grad(loss_fn)(deltas, gaussians, tgt)
            updates, state = opt.update(grads, state)
            deltas = optax.apply_updates(deltas, updates)
            return (deltas, state), None

        (deltas, _), _ = jax.lax.scan(
            body, (deltas, state), None, length=eval_cfg.pose_align_steps
        )
        return deltas

    return align


def evaluate_scene(
    params,
    model_cfg: VicaSplatConfig,
    dec_cfg: DecoderSplattingConfig,
    eval_cfg: EvalConfig,
    batch: dict,           # numpy batch (B=1) with context/target
    encode_fn=None,        # jitted encoder (params, ctx) -> outputs dict
    render_fn=None,        # jitted renderer
    align_fn=None,
    benchmarker: Optional[Benchmarker] = None,
    lpips_fn=None,         # optional perceptual metric (needs VGG weights)
) -> dict:
    ctx, tgt = batch["context"], batch["target"]
    assert ctx["image"].shape[0] == 1, (
        "evaluate_scene scores one scene at a time; split batches before "
        "calling (test loaders run at batch_size 1, reference "
        "model_wrapper.py:326)"
    )
    h, w = tgt["image"].shape[-3:-1]
    bench = benchmarker or Benchmarker()

    if encode_fn is None:
        encode_fn = jax.jit(
            lambda p, c: vicasplat_forward(
                p, model_cfg, dict(c, image=c["image"] * 2 - 1),
                dtype=jnp.bfloat16,
            )
        )
    if render_fn is None:
        render_fn = jax.jit(
            lambda g, t, rot, trans: decoder_forward(
                dec_cfg, g, t["extrinsics"], t["intrinsics"], t["near"],
                t["far"], (h, w), cam_rot_delta=rot, cam_trans_delta=trans,
            )
        )

    out = bench.time_fn("encoder", encode_fn, params, ctx)
    gaussians = out["gaussians"]

    b, v = tgt["extrinsics"].shape[:2]
    deltas = {"rot": jnp.zeros((b, v, 3)), "trans": jnp.zeros((b, v, 3))}
    if eval_cfg.align_pose and eval_cfg.pose_align_steps > 0 and align_fn is not None:
        deltas = bench.time_fn("pose_align", align_fn, gaussians, tgt)

    rendered = bench.time_fn(
        "decoder", render_fn, gaussians, tgt, deltas["rot"], deltas["trans"]
    )

    result = {"scene": batch.get("scene", ["?"])[0]}
    if eval_cfg.coverage_check:
        from ..decoder.splatting import coverage_report

        cov = coverage_report(
            dec_cfg, gaussians, tgt["extrinsics"], tgt["intrinsics"],
            (h, w), tag=str(result["scene"]),
        )
        result["coverage_truncated_frac"] = cov["truncated_frac"]
        result["coverage_tile_overflow_frac"] = cov["tile_overflow_frac"]
    if eval_cfg.compute_scores:
        result["psnr"] = float(compute_psnr(tgt["image"], rendered.color).mean())
        result["ssim"] = float(compute_ssim(tgt["image"], rendered.color))
        if lpips_fn is not None:
            # reference evaluates LPIPS per scene (model_wrapper.py:360-364)
            result["lpips"] = float(lpips_fn(tgt["image"], rendered.color))
        gt_poses = np.asarray(ctx["extrinsics"][0])
        pred_poses = np.asarray(out["gaussian_camera_extrins"][0])
        result.update(
            {k: v for k, v in camera_eval_metrics(gt_poses, pred_poses).items()
             if np.isscalar(v) or isinstance(v, float)}
        )
    result["_rendered"] = np.asarray(rendered.color[0])
    result["_depth"] = np.asarray(rendered.depth[0])
    result["_outputs"] = out
    return result


def save_scene_outputs(result: dict, batch: dict, eval_cfg: EvalConfig,
                       model_cfg: VicaSplatConfig):
    """Write transforms.json, per-view renders, comparison grids, PLY."""
    out_dir = pathlib.Path(eval_cfg.output_path) / str(result["scene"])
    out_dir.mkdir(parents=True, exist_ok=True)
    out = result["_outputs"]

    poses = np.asarray(out["gaussian_camera_extrins"][0])
    intr = batch["context"]["intrinsics"][0]
    h, w = batch["context"]["image"].shape[2:4]
    transforms = {
        "camera_model": "PINHOLE",
        "fl_x": float(intr[0, 0, 0] * w),
        "fl_y": float(intr[0, 1, 1] * h),
        "cx": float(intr[0, 0, 2] * w),
        "cy": float(intr[0, 1, 2] * h),
        "w": int(w),
        "h": int(h),
        "frames": [
            {"file_path": f"context/{i:03d}.png",
             "transform_matrix": poses[i].tolist()}
            for i in range(len(poses))
        ],
    }
    with open(out_dir / "transforms.json", "w") as f:
        json.dump(transforms, f, indent=2)

    if eval_cfg.save_image:
        for i, img in enumerate(batch["context"]["image"][0]):
            save_image(img, out_dir / "context" / f"{i:03d}.png")
        for i, img in enumerate(result["_rendered"]):
            save_image(img, out_dir / "color" / f"{i:03d}.png")
    if eval_cfg.save_compare:
        rows = [
            hcat(np.asarray(gt), np.asarray(pr))
            for gt, pr in zip(batch["target"]["image"][0], result["_rendered"])
        ]
        save_image(np.concatenate(rows, axis=0), out_dir / "compare.png")
    if eval_cfg.save_video:
        save_video(result["_rendered"], out_dir / "render.mp4")
    if eval_cfg.save_gs:
        g = out["gaussians"]
        export_ply(
            np.asarray(g.means).reshape(-1, 3),
            np.asarray(g.scales).reshape(-1, 3),
            np.asarray(g.rotations).reshape(-1, 4),
            np.asarray(g.harmonics).reshape(-1, *g.harmonics.shape[-2:]),
            np.asarray(g.opacities).reshape(-1),
            out_dir / "gaussians.ply",
        )
