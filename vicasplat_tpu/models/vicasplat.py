"""The VicaSplat model: unposed video -> 3D Gaussians + camera poses.

Parity target: reference src/model/encoder/vicasplat.py:37-290. Forward takes
a context dict {image (B,T,H,W,3) in [-1,1], intrinsics (B,T,3,3) normalized,
extrinsics (B,T,4,4) optional for view-space depth} and returns the Gaussian
scene, per-frame poses decoded from normalized dual quaternions (frame 0
pinned to identity), optional FoV intrinsics, and auxiliary outputs.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..geometry import dual_quaternion as dqlib
from ..geometry.quaternion import qnormalize
from ..geometry.se3 import intrinsics_from_fov
from .adapter import (
    GaussianAdapterConfig,
    adapt_gaussians,
    opacity_warmup_map,
)
from .heads import (
    DPTConfig,
    camera_head,
    dpt_gs_head,
    dpt_regression_head,
    init_camera_extrinsic_head,
    init_camera_intrinsic_head,
    init_dpt,
    postprocess_conf_exp,
    postprocess_pts3d_exp,
)
from .vicanet import VicaNetConfig, init_vicanet, vicanet_forward


@dataclasses.dataclass(frozen=True)
class OpacityMappingConfig:
    initial: float = 0.0
    final: float = 0.0
    warm_up: int = 1


@dataclasses.dataclass(frozen=True)
class VicaSplatConfig:
    backbone: VicaNetConfig = VicaNetConfig()
    gaussian_adapter: GaussianAdapterConfig = GaussianAdapterConfig()
    opacity_mapping: OpacityMappingConfig = OpacityMappingConfig()
    predict_opacity: bool = False
    predict_conf: bool = False
    camera_type: str = "dq"  # "dq" | "qt"
    gs_center_head_type: str = "dpt"
    gs_param_head_type: str = "dpt_gs"
    input_mean: tuple = (0.5, 0.5, 0.5)
    input_std: tuple = (0.5, 0.5, 0.5)
    # distance bounds for the exp pts3d parameterization (reference
    # postprocess.py 'exp' mode vmin/vmax). Default is the released-config
    # no-op; finite bounds stabilize training from random init.
    pts3d_bounds: tuple = (0.0, float("inf"))
    # DPT full-res tail backend: "xla" | "pallas" | "auto" (fused pallas
    # kernel on accelerators — ops/dpt_tail.py)
    head_tail_backend: str = "xla"
    # Opt-in DPT-head stabilization for training from RANDOM init
    # (heads.DPTConfig.stabilize: RCU LayerScale + trunk-output LayerNorm).
    # Off = reference-parity layout; released-checkpoint conversion needs
    # it off. The extra params live only under the head subtrees, so a
    # stabilized head can still warm-start everything else.
    dpt_stabilize: bool = False

    @property
    def camera_extrinsic_channels(self) -> int:
        return 8 if self.camera_type == "dq" else 7

    def dpt_hooks(self) -> tuple:
        l2 = self.backbone.dec_depth
        return (0, l2 * 2 // 4, l2 * 3 // 4, l2)


def init_vicasplat(key, cfg: VicaSplatConfig):
    from .heads import init_linear_head

    k_bb, k_h1, k_h2 = jax.random.split(key, 3)
    bb = cfg.backbone
    hook_dims = (bb.enc_embed_dim, bb.dec_embed_dim, bb.dec_embed_dim, bb.dec_embed_dim)
    center_cfg = DPTConfig(
        hook_dims=hook_dims,
        num_channels=3 + (1 if cfg.predict_conf else 0),
        head_type="regression",
        patch_size=bb.patch_size,
        stabilize=cfg.dpt_stabilize,
    )
    gs_cfg = DPTConfig(
        hook_dims=hook_dims,
        num_channels=cfg.gaussian_adapter.raw_gs_dim,
        head_type="gs_params",
        patch_size=bb.patch_size,
        use_input_merger=True,
        stabilize=cfg.dpt_stabilize,
    )
    if cfg.gs_center_head_type == "dpt":
        center_head = init_dpt(k_h1, center_cfg)
    else:  # linear pixel-shuffle head (reference heads/linear_head.py:12-42)
        center_head = init_linear_head(
            k_h1, bb.dec_embed_dim, bb.patch_size, center_cfg.num_channels
        )
    if cfg.gs_param_head_type in ("dpt", "dpt_gs"):
        gs_head = init_dpt(k_h2, gs_cfg)
    else:
        gs_head = init_linear_head(
            k_h2, bb.dec_embed_dim, bb.patch_size, gs_cfg.num_channels
        )
    params = {
        "backbone": init_vicanet(k_bb, bb),
        "center_head": center_head,
        "gaussian_param_head": gs_head,
        "camera_extrinsic_head": init_camera_extrinsic_head(
            bb.dec_embed_dim, cfg.camera_extrinsic_channels
        ),
    }
    if not bb.use_intrinsic_embedding:
        params["camera_intrinsic_head"] = init_camera_intrinsic_head(
            bb.dec_embed_dim, math.pi * 50 / 180
        )
    return params


def decode_camera(pred: jnp.ndarray, camera_type: str):
    """Raw head output -> (normalized parameter vector, 4x4 c2w poses).

    +1.0 is added to the real quaternion component so the zero-initialized
    head decodes to the identity pose (reference vicasplat.py:179-191).
    """
    pred = pred.astype(jnp.float32)
    pred = pred.at[..., 3].add(1.0)
    if camera_type == "dq":
        r_norm = jnp.linalg.norm(pred[..., :4], axis=-1, keepdims=True)
        pred = pred / r_norm
        mats = dqlib.homogeneous_matrix(dqlib.from_dq_array(pred))
    elif camera_type == "qt":
        q = qnormalize(pred[..., :4], eps=0.0)
        pred = jnp.concatenate([q, pred[..., 4:]], axis=-1)
        mats = dqlib.homogeneous_matrix(dqlib.from_quat_pose(pred))
    else:
        raise ValueError(camera_type)
    return pred, mats


def vicasplat_forward(
    params,
    cfg: VicaSplatConfig,
    context: dict,
    global_step: int = 0,
    *,
    distill: bool = False,
    compute_viewspace_depth: bool = False,
    dtype=jnp.bfloat16,
    remat: bool = False,
    remat_policy=None,
    pipeline_mesh=None,
    sp_mesh=None,
) -> dict:
    images = context["image"]  # (B, T, H, W, 3), normalized to [-1, 1]
    B, T, H, W, _ = images.shape
    bb = cfg.backbone

    _, camera_embeds, global_embeds, interms = vicanet_forward(
        params["backbone"], bb, images, context.get("intrinsics"),
        dtype=dtype, remat=remat, remat_policy=remat_policy,
        pipeline_mesh=pipeline_mesh, sp_mesh=sp_mesh,
    )

    # ---- camera pose ----
    pred_raw = camera_head(params["camera_extrinsic_head"], camera_embeds, dtype)
    pred_extrins, pred_mats = decode_camera(pred_raw, cfg.camera_type)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=pred_mats.dtype), (B, 1, 4, 4))
    extrinsics_4x4 = jnp.concatenate([eye, pred_mats], axis=1)  # (B, T, 4, 4)

    # ---- camera intrinsics (when not embedding GT intrinsics) ----
    if global_embeds is not None:
        pred_intrins = camera_head(
            params["camera_intrinsic_head"], global_embeds, dtype
        ).astype(jnp.float32)
        intrinsics_3x3 = intrinsics_from_fov(pred_intrins)
        intrinsics_3x3 = jnp.broadcast_to(
            intrinsics_3x3[:, None], (B, T, 3, 3)
        )
    else:
        pred_intrins = None
        intrinsics_3x3 = None

    # ---- per-pixel heads (frames folded into batch) ----
    # Heads run in landscape: portrait batches (H > W) have their token
    # grids and output maps transposed around the head, like the
    # reference's transpose_to_landscape (croco/misc.py:71-110) — the
    # backbone and camera heads stay in the original orientation. Under
    # jit, orientation is a static property of the traced shape; mixed
    # batches are split by the data pipeline into one specialization each.
    gh, gw = H // bb.patch_size, W // bb.patch_size
    n_patches = gh * gw
    portrait = H > W

    def _head_grid(tok):
        tok = tok.reshape(B * T, n_patches, tok.shape[-1])
        if portrait:
            tok = jnp.swapaxes(
                tok.reshape(B * T, gh, gw, -1), 1, 2
            ).reshape(B * T, n_patches, -1)
        return tok

    def _head_out(x):
        """(B*T, h, w, ch) head output -> original orientation."""
        return jnp.swapaxes(x, 1, 2) if portrait else x

    hooks = cfg.dpt_hooks()
    hook_tokens = [_head_grid(interms[h]) for h in hooks]
    grid_hw = (gw, gh) if portrait else (gh, gw)
    head_images = images.reshape(B * T, H, W, 3)
    if portrait:
        head_images = jnp.swapaxes(head_images, 1, 2)

    center_cfg = DPTConfig(
        hook_dims=(bb.enc_embed_dim,) + (bb.dec_embed_dim,) * 3,
        num_channels=3 + (1 if cfg.predict_conf else 0),
        head_type="regression",
        patch_size=bb.patch_size,
        tail_backend=cfg.head_tail_backend,
    )
    if cfg.gs_center_head_type == "dpt":
        center_out = dpt_regression_head(
            params["center_head"], center_cfg, hook_tokens, grid_hw, dtype
        )  # (B*T, h, w, 3[+1]) in landscape orientation
    else:
        from .heads import linear_head

        center_out = linear_head(
            params["center_head"], hook_tokens[-1], grid_hw, bb.patch_size,
            center_cfg.num_channels, dtype,
        )
    center_out = _head_out(center_out)
    gs_centers = postprocess_pts3d_exp(
        center_out[..., :3], *cfg.pts3d_bounds
    ).reshape(B, T, H, W, 3)
    conf = (
        postprocess_conf_exp(center_out[..., 3]).reshape(B, T, H, W)
        if cfg.predict_conf
        else None
    )

    if compute_viewspace_depth and "extrinsics" in context:
        ext = context["extrinsics"]  # (B, T, 4, 4) c2w
        rel = gs_centers - ext[:, :, None, None, :3, 3]
        # R^-1 (p - t): view-space z (reference vicasplat.py:223-232)
        viewspace = jnp.einsum("btji,bthwj->bthwi", ext[:, :, :3, :3], rel)
        viewspace_depth = viewspace[..., 2]
    else:
        viewspace_depth = None

    if distill:
        return dict(
            pred_extrins=pred_extrins,
            pred_intrins=pred_intrins,
            gaussian_camera_extrins=extrinsics_4x4,
            gaussian_camera_intrins=intrinsics_3x3,
            gaussian_centers=gs_centers,
            confidence=conf,
            context_view_depths=viewspace_depth,
        )

    gs_cfg = DPTConfig(
        hook_dims=(bb.enc_embed_dim,) + (bb.dec_embed_dim,) * 3,
        num_channels=cfg.gaussian_adapter.raw_gs_dim,
        head_type="gs_params",
        patch_size=bb.patch_size,
        use_input_merger=True,
        tail_backend=cfg.head_tail_backend,
    )
    if cfg.gs_param_head_type in ("dpt", "dpt_gs"):
        gs_params_out = _head_out(dpt_gs_head(
            params["gaussian_param_head"], gs_cfg, hook_tokens, grid_hw,
            head_images, dtype,
        )).reshape(B, T, H, W, -1)
    else:
        from .heads import linear_head

        gs_params_out = _head_out(linear_head(
            params["gaussian_param_head"], hook_tokens[-1], grid_hw,
            bb.patch_size, gs_cfg.num_channels, dtype,
        )).reshape(B, T, H, W, -1)

    raw_gaussians = jnp.concatenate(
        [gs_centers, gs_params_out.astype(jnp.float32)], axis=-1
    )
    om = cfg.opacity_mapping
    opacity_map = (
        None
        if cfg.predict_opacity
        else opacity_warmup_map(om.initial, om.final, om.warm_up, global_step)
    )
    gaussians = adapt_gaussians(raw_gaussians, cfg.gaussian_adapter, opacity_map)

    return dict(
        gaussians=gaussians,
        pred_extrins=pred_extrins,
        pred_intrins=pred_intrins,
        raw_gaussians=raw_gaussians,
        gaussian_camera_extrins=extrinsics_4x4,
        gaussian_camera_intrins=intrinsics_3x3,
        gaussian_centers=gs_centers,
        confidence=conf,
        context_view_depths=viewspace_depth,
    )


def normalize_images(images_01: jnp.ndarray, cfg: VicaSplatConfig) -> jnp.ndarray:
    """The encoder's data shim: [0,1] images -> normalized input
    (reference vicasplat.py:280-290)."""
    mean = jnp.asarray(cfg.input_mean, images_01.dtype)
    std = jnp.asarray(cfg.input_std, images_01.dtype)
    return (images_01 - mean) / std
