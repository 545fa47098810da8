"""The training step: encode context video -> Gaussians + poses, render
target views, sum losses, AdamW update. Data-parallel over a 1-D mesh.

Parity target: reference src/model/model_wrapper.py:184-246 (training_step).
The returned step function is jit-compatible; with batch leaves sharded over
the mesh's data axis and params replicated, XLA emits the gradient psum —
the NCCL all-reduce of the reference's DDP, but compiler-inserted.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..decoder.splatting import DecoderSplattingConfig, decoder_forward
from ..loss.losses import (
    LossCameraConfig,
    LossLpipsConfig,
    LossMseConfig,
    camera_loss,
    mse_loss,
)
from ..models.vicasplat import VicaSplatConfig, vicasplat_forward
from .optimizer import OptimizerConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: VicaSplatConfig = VicaSplatConfig()
    decoder: DecoderSplattingConfig = DecoderSplattingConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    mse: LossMseConfig = LossMseConfig()
    camera: LossCameraConfig = LossCameraConfig()
    lpips: LossLpipsConfig = LossLpipsConfig()
    dtype: str = "bfloat16"
    remat: bool = True
    # "none": full recompute (lowest memory). "dots": jax checkpoint policy
    # dots_with_no_batch_dims_saveable — matmul outputs survive the scan
    # boundary, the backward recomputes only elementwise work.
    remat_policy: str = "none"
    distill_weight: float = 1.0
    # staged distillation schedule (reference model_wrapper.py:185,249 +
    # config/experiment/distill.yaml:34-40): steps < distill_only_steps run
    # WITHOUT rendering (camera loss + distillation only); the teacher stops
    # after distill_max_steps.
    distill_only_steps: int = 0
    distill_max_steps: int = 0
    # gradient accumulation (beyond the reference, which always has enough
    # GPUs for its global batch): split the batch into this many microbatches
    # inside one jitted step — a lax.scan computes and sums per-microbatch
    # grads, then one optimizer update fires. Activation memory scales with
    # the microbatch; a single chip can match any reference global batch.
    accumulate_steps: int = 1


def distillation_loss(out, teacher_fn, batch, key):
    """Distillation branch: two random anchor frames -> frozen teacher
    pseudo-pts3d (view-1 frame) -> transform to the canonical (first-context)
    frame via GT anchor pose -> Regr3D against the student's point/conf maps.

    (parity: reference model_wrapper.py:249-301; anchor sampling simplified
    to two distinct random frames.)
    """
    from ..loss.conf_point import Regr3DConfig, regr3d_loss

    ctx = batch["context"]
    B, T = ctx["image"].shape[:2]
    # the reference anchors are an ADJACENT frame pair (segment j, j+1) with
    # j uniform (model_wrapper.py:155-181 at temporal_compression=1)
    j = jax.random.randint(key, (), 0, max(T - 1, 1))
    idx = jnp.stack([j, j + 1])
    anchor = jnp.take(ctx["image"], idx, axis=1)  # (B, 2, H, W, 3) in [0,1]

    teacher = teacher_fn(anchor[:, 0] * 2 - 1, anchor[:, 1] * 2 - 1)
    first_ext = jnp.take(ctx["extrinsics"], idx[:1], axis=1)[:, 0]  # (B,4,4)

    def to_canonical(pts):
        return (
            jnp.einsum("bij,bhwj->bhwi", first_ext[:, :3, :3], pts)
            + first_ext[:, None, None, :3, 3]
        )

    pseudo = jnp.stack(
        [to_canonical(teacher["view1"]["pts3d"]),
         to_canonical(teacher["view2"]["pts3d"])], axis=1
    )
    pseudo_conf = jnp.stack(
        [teacher["view1"]["conf"], teacher["view2"]["conf"]], axis=1
    )
    pred_pts = jnp.take(out["gaussian_centers"], idx, axis=1)
    if out.get("confidence") is not None:
        pred_conf = jnp.take(out["confidence"], idx, axis=1)
    else:
        pred_conf = jnp.ones_like(pseudo_conf)
    loss, logs = regr3d_loss(
        pred_pts, pred_conf, pseudo, pseudo_conf,
        Regr3DConfig(normalize_pointcloud=T > 2,
                     match_confidence=out.get("confidence") is not None),
    )
    return loss, logs


def compute_loss(params, cfg: TrainConfig, batch, global_step, lpips_fn=None,
                 teacher_fn=None, distill_key=None, phase: str = "full",
                 mesh=None, data_axis: str = "data", *,
                 pipeline_mesh=None, sp_mesh=None):
    """batch: {"context": {image (B,T,H,W,3) in [0,1], intrinsics, extrinsics,
    near, far}, "target": {...}}. Images are shimmed to [-1,1] here.

    `phase` is a STATIC staging switch so each stage compiles only the work
    it needs (reference model_wrapper.py:185-246):
      - "distill_only": no rendering; camera loss + distillation only
        (steps < distill_only_steps of the distill experiment);
      - "distill": full objective + the frozen-teacher distillation term
        (steps <= distill_max_steps);
      - "full": full objective, teacher off.
    """
    ctx, tgt = batch["context"], batch["target"]
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    ctx_model = dict(ctx)
    ctx_model["image"] = ctx["image"] * 2.0 - 1.0  # normalize shim

    out = vicasplat_forward(
        params, cfg.model, ctx_model, global_step, dtype=dtype,
        remat=cfg.remat, distill=phase == "distill_only",
        remat_policy=(None if cfg.remat_policy == "none" else cfg.remat_policy),
        pipeline_mesh=pipeline_mesh, sp_mesh=sp_mesh,
    )
    losses = {
        "camera": camera_loss(
            out["pred_extrins"], ctx["extrinsics"], out["pred_intrins"],
            ctx.get("intrinsics"), cfg.camera,
        ),
    }
    if phase == "distill_only":
        mse_val = jnp.float32(1.0)  # psnr log placeholder (no render)
    else:
        h, w = tgt["image"].shape[-3:-1]
        render_args = (out["gaussians"], tgt["extrinsics"], tgt["intrinsics"],
                       tgt["near"], tgt["far"])

        def _render(g, ext, K, near, far):
            return decoder_forward(cfg.decoder, g, ext, K, near, far, (h, w))

        if mesh is not None and mesh.shape.get(data_axis, 1) > 1:
            # decoder_forward serializes the batch with lax.map (batched
            # sorts are catastrophic on TPU — see ops/rasterize). GSPMD
            # cannot partition a loop's iteration axis, so under plain jit
            # it ALL-GATHERS the Gaussians and renders the full batch on
            # every device (8x work). shard_map makes the render batch-
            # local: each device lax.maps over its own shard only.
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            rendered = shard_map(
                _render, mesh=mesh,
                in_specs=(P(data_axis),) * len(render_args),
                out_specs=P(data_axis),
                check_rep=False,
            )(*render_args)
        else:
            rendered = _render(*render_args)
        losses["mse"] = mse_loss(rendered.color, tgt["image"], cfg.mse)
        if lpips_fn is not None:
            # reference loss_lpips.py:41-46 returns 0 before apply_after_step
            gate = jnp.where(
                jnp.asarray(global_step) >= cfg.lpips.apply_after_step, 1.0, 0.0
            )
            losses["lpips"] = (
                cfg.lpips.weight * gate * lpips_fn(rendered.color, tgt["image"])
            )
        mse_val = ((rendered.color - tgt["image"]) ** 2).mean()
    if phase in ("distill_only", "distill"):
        assert teacher_fn is not None, f"phase {phase} requires a teacher"
        d_loss, d_logs = distillation_loss(out, teacher_fn, batch, distill_key)
        losses["distillation"] = cfg.distill_weight * d_loss
    loss = sum(losses.values())
    logs = dict(losses, psnr=-10.0 * jnp.log10(jnp.clip(mse_val, 1e-10)))
    return loss, logs


def pick_phase(cfg: TrainConfig, global_step: int, has_teacher: bool) -> str:
    """Host-side stage selection per step (static jit arg; recompiles only at
    stage boundaries). Matches reference model_wrapper.py:185 (<) and :249
    (<=)."""
    if has_teacher and global_step < cfg.distill_only_steps:
        return "distill_only"
    if has_teacher and global_step <= cfg.distill_max_steps:
        return "distill"
    return "full"


def make_train_step(cfg: TrainConfig, optimizer: optax.GradientTransformation,
                    lpips_fn=None, teacher_fn=None, mesh=None,
                    data_axis: str = "data", pipeline_mesh=None,
                    sp_mesh=None):
    """mesh: pass the data-parallel jax.sharding.Mesh when the step will run
    sharded — the render is then shard_map'ed batch-local (see compute_loss).
    pipeline_mesh: a ("pipe",) or ("pipe", "data") mesh (parallel/pp.py) —
    the backbone's stacked blocks run as a GPipe pipeline, stage-sharded
    over "pipe" (differentiable; the backward is the mirror pipeline).
    sp_mesh: a ("data", "seq") mesh (parallel/sp.py) — sequence-parallel
    activation constraints inside the backbone."""
    def grads_once(params, batch, global_step, key, phase):
        (loss, logs), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(params, cfg, batch, global_step, lpips_fn, teacher_fn, key,
          phase, mesh, data_axis, pipeline_mesh=pipeline_mesh,
          sp_mesh=sp_mesh)
        # NaN-grad guard (reference src/main.py:42-47 zeroes NaN grads);
        # per-microbatch so one bad microbatch can't poison the whole sum
        grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), grads
        )
        return loss, logs, grads

    def train_step(params, opt_state, batch, global_step, phase="full"):
        key = jax.random.fold_in(jax.random.PRNGKey(0), global_step)
        A = cfg.accumulate_steps
        if A <= 1:
            loss, logs, grads = grads_once(params, batch, global_step, key,
                                           phase)
        else:
            def to_micro(x):
                if x.shape[0] % A:
                    raise ValueError(
                        f"batch dim {x.shape[0]} not divisible by "
                        f"accumulate_steps={A}")
                return x.reshape((A, x.shape[0] // A) + x.shape[1:])

            micro = jax.tree.map(to_micro, batch)
            mb0 = jax.tree.map(lambda x: x[0], micro)
            _, logs_s, _ = jax.eval_shape(
                lambda p, mb, gs, k: grads_once(p, mb, gs, k, phase),
                params, mb0, global_step, key)
            zeros = lambda t: jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), t)

            def body(carry, xs):
                g_acc, loss_acc, logs_acc = carry
                mb, i = xs
                loss, logs, g = grads_once(
                    params, mb, global_step, jax.random.fold_in(key, i),
                    phase)
                return (jax.tree.map(jnp.add, g_acc, g), loss_acc + loss,
                        jax.tree.map(jnp.add, logs_acc, logs)), None

            (grads, loss, logs), _ = jax.lax.scan(
                body,
                (jax.tree.map(jnp.zeros_like, params), jnp.float32(0.0),
                 zeros(logs_s)),
                (micro, jnp.arange(A)),
            )
            inv = 1.0 / A
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss = loss * inv
            logs = jax.tree.map(lambda v: v * inv, logs)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        logs["loss"] = loss
        logs["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, logs

    return train_step
