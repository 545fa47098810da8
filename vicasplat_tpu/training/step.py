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
    dtype: str = "bfloat16"
    remat: bool = True


def compute_loss(params, cfg: TrainConfig, batch, global_step, lpips_fn=None,
                 lpips_weight: float = 0.05):
    """batch: {"context": {image (B,T,H,W,3) in [0,1], intrinsics, extrinsics,
    near, far}, "target": {...}}. Images are shimmed to [-1,1] here."""
    ctx, tgt = batch["context"], batch["target"]
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    ctx_model = dict(ctx)
    ctx_model["image"] = ctx["image"] * 2.0 - 1.0  # normalize shim

    out = vicasplat_forward(
        params, cfg.model, ctx_model, global_step, dtype=dtype, remat=cfg.remat
    )
    h, w = tgt["image"].shape[-3:-1]
    rendered = decoder_forward(
        cfg.decoder,
        out["gaussians"],
        tgt["extrinsics"],
        tgt["intrinsics"],
        tgt["near"],
        tgt["far"],
        (h, w),
    )
    losses = {
        "mse": mse_loss(rendered.color, tgt["image"], cfg.mse),
        "camera": camera_loss(
            out["pred_extrins"], ctx["extrinsics"], out["pred_intrins"],
            ctx.get("intrinsics"), cfg.camera,
        ),
    }
    if lpips_fn is not None:
        losses["lpips"] = lpips_weight * lpips_fn(rendered.color, tgt["image"])
    loss = sum(losses.values())
    mse_val = ((rendered.color - tgt["image"]) ** 2).mean()
    logs = dict(losses, psnr=-10.0 * jnp.log10(jnp.clip(mse_val, 1e-10)))
    return loss, logs


def make_train_step(cfg: TrainConfig, optimizer: optax.GradientTransformation,
                    lpips_fn=None):
    def train_step(params, opt_state, batch, global_step):
        (loss, logs), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(params, cfg, batch, global_step, lpips_fn)
        # NaN-grad guard (reference src/main.py:42-47 zeroes NaN grads)
        grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        logs["loss"] = loss
        logs["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, logs

    return train_step
