"""Pose evaluator: per-scene predicted-pose quality (ATE/RPE/AUC), with
optional render-and-compare pose refinement.

Parity target: reference src/evaluation/pose_evaluator.py:34-245 (frozen
encoder, pose metrics before/after refinement, running-mean tables) and
src/eval_pose.py.
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
from collections import defaultdict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..decoder.splatting import DecoderSplattingConfig, decoder_forward
from ..models.vicasplat import VicaSplatConfig, vicasplat_forward
from .metrics import camera_eval_metrics, pose_auc


@dataclasses.dataclass(frozen=True)
class PoseEvalConfig:
    refine_steps: int = 0   # reference ships with 0 (pose_evaluator.py:112-114)
    rot_opt_lr: float = 0.005
    trans_opt_lr: float = 0.005
    output_path: str = "outputs/pose_eval"


class PoseEvaluator:
    def __init__(self, params, model_cfg: VicaSplatConfig,
                 dec_cfg: DecoderSplattingConfig, cfg: PoseEvalConfig):
        self.params = params
        self.model_cfg = model_cfg
        self.dec_cfg = dec_cfg
        self.cfg = cfg
        self.metrics = defaultdict(list)
        self._encode = jax.jit(
            lambda p, c: vicasplat_forward(
                p, model_cfg, dict(c, image=c["image"] * 2 - 1),
                dtype=jnp.bfloat16,
            )
        )

    def evaluate_batch(self, batch: dict) -> dict:
        ctx = batch["context"]
        out = self._encode(self.params, ctx)
        pred = np.asarray(out["gaussian_camera_extrins"][0])
        gt = np.asarray(ctx["extrinsics"][0])

        if self.cfg.refine_steps > 0:
            pred = self._refine(out, ctx, pred)

        m = camera_eval_metrics(gt, pred)
        # degenerate trajectories yield no entry (metrics.py returns None);
        # record NaN so summaries (np.nanmean) skip them cleanly
        result = {
            "scene": batch.get("scene", ["?"])[0],
            "ate": m.get("ate", float("nan")),
            "rpe_trans": m.get("rpe_trans", float("nan")),
            "rpe_rot": m.get("rpe_rot", float("nan")),
        }
        for k, v in result.items():
            if k != "scene":
                self.metrics[k].append(v)
        if "rot_err_deg" in m:
            self.metrics["rot_err_deg"].extend(m["rot_err_deg"].tolist())
            self.metrics["trans_err_deg"].extend(m["trans_err_deg"].tolist())
        return result

    def _refine(self, out, ctx, pred):
        """Render-and-compare SE(3) refinement of predicted context poses
        against the context images (reference pose_evaluator.py:92-155)."""
        import optax

        h, w = ctx["image"].shape[2:4]
        gaussians = out["gaussians"]
        tgt = {
            "extrinsics": out["gaussian_camera_extrins"],
            "intrinsics": ctx["intrinsics"],
            "near": ctx["near"],
            "far": ctx["far"],
            "image": ctx["image"],
        }

        def loss_fn(deltas):
            rendered = decoder_forward(
                self.dec_cfg, gaussians, tgt["extrinsics"], tgt["intrinsics"],
                tgt["near"], tgt["far"], (h, w),
                cam_rot_delta=deltas["rot"], cam_trans_delta=deltas["trans"],
            )
            mse = ((rendered.color - tgt["image"]) ** 2).mean()
            # reference pose_evaluator.py:136-141 adds an SSIM structure
            # term (1 - structure) on top of the configured image losses
            from ..loss.ssim import ssim_components

            structure = ssim_components(
                rendered.color.reshape(-1, h, w, 3),
                tgt["image"].reshape(-1, h, w, 3),
            )["structure"]
            return mse + (1.0 - structure)

        b, v = tgt["extrinsics"].shape[:2]
        deltas = {"rot": jnp.zeros((b, v, 3)), "trans": jnp.zeros((b, v, 3))}
        opt = optax.adam(self.cfg.rot_opt_lr)
        state = opt.init(deltas)
        for _ in range(self.cfg.refine_steps):
            grads = jax.grad(loss_fn)(deltas)
            updates, state = opt.update(grads, state)
            deltas = optax.apply_updates(deltas, updates)
        from ..geometry.se3 import update_pose

        refined = update_pose(
            np.asarray(deltas["trans"][0]), np.asarray(deltas["rot"][0]),
            jnp.asarray(pred),
        )
        return np.asarray(refined)

    def summary(self) -> dict:
        out = {
            k: float(np.nanmean(v))
            for k, v in self.metrics.items()
            if k not in ("rot_err_deg", "trans_err_deg")
        }
        errs = np.maximum(
            np.asarray(self.metrics["rot_err_deg"]),
            np.asarray(self.metrics["trans_err_deg"]),
        )
        if len(errs):
            a5, a10, a20 = pose_auc(errs, (5, 10, 20))
            out.update({"auc@5": a5, "auc@10": a10, "auc@20": a20})
            (a30,) = pose_auc(errs, (30,))
            out["auc@30"] = a30
        return out

    def dump(self):
        path = pathlib.Path(self.cfg.output_path)
        path.mkdir(parents=True, exist_ok=True)
        with open(path / "pose_metrics.json", "w") as f:
            json.dump(self.summary(), f, indent=2)
        return path / "pose_metrics.json"
