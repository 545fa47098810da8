"""Diagnose why the synthetic-pose trained model's pose-AUC is 0 (job 032:
ATE 0.417 -> 0.157, auc@30 still 0.0).

AUC uses max(rot_err_deg, trans_err_deg) per frame pair vs frame 0
(reference cam_utils pose_auc semantics); this prints the two error
distributions separately for the trained checkpoint on the held-out test
scenes, plus the GT inter-frame motion magnitudes, to see which term is
saturating and whether the task is even well-conditioned (tiny GT baselines
make translation DIRECTION ill-posed).

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/diag_pose_auc.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from vicasplat_tpu.utils.config import load_config
from vicasplat_tpu.data import DataModule
from vicasplat_tpu.evaluation.metrics import (
    camera_eval_metrics, rotation_angle_deg, translation_angle_deg,
)
from vicasplat_tpu.models import init_vicasplat
from vicasplat_tpu.models.vicasplat import vicasplat_forward
from vicasplat_tpu.utils.checkpointing import CheckpointManager, load_weights
import jax.numpy as jnp

cfg = load_config("/root/repo/configs/main.yaml", experiment="synthetic_pose")
latest = CheckpointManager(
    "/root/repo/outputs/synthetic_pose/ckpts", keep=5).latest()
print("ckpt:", latest)
params = load_weights(
    str(latest), template=init_vicasplat(jax.random.PRNGKey(0), cfg.encoder))

enc = jax.jit(lambda p, c: vicasplat_forward(
    p, cfg.encoder, dict(c, image=c["image"] * 2 - 1), dtype=jnp.bfloat16))

dm = DataModule(cfg.dataset, cfg.data_loader, None)
loader = dm.test_dataloader()
rot_all, trans_all = [], []
for i, batch in enumerate(loader):
    ctx = batch["context"]
    out = enc(params, ctx)
    pred = np.asarray(out["gaussian_camera_extrins"][0], np.float64)
    gt = np.asarray(ctx["extrinsics"][0], np.float64)
    m = camera_eval_metrics(gt, pred)
    rel_gt = np.linalg.inv(gt[:1]) @ gt[1:]
    tmag = np.linalg.norm(rel_gt[:, :3, 3], axis=-1)
    rmag = rotation_angle_deg(
        np.broadcast_to(np.eye(3), rel_gt[:, :3, :3].shape), rel_gt[:, :3, :3])
    rel_pr = np.linalg.inv(pred[:1]) @ pred[1:]
    pmag = np.linalg.norm(rel_pr[:, :3, 3], axis=-1)
    print(f"[{i}] {batch.get('scene', ['?'])[0]}")
    print(f"    rot_err_deg   {np.round(m['rot_err_deg'], 2)}")
    print(f"    trans_err_deg {np.round(m['trans_err_deg'], 2)}")
    print(f"    gt |t| {np.round(tmag, 3)}  pred |t| {np.round(pmag, 3)}  "
          f"gt rot deg {np.round(rmag, 2)}")
    rot_all.extend(m["rot_err_deg"].tolist())
    trans_all.extend(m["trans_err_deg"].tolist())
loader.close()

rot_all, trans_all = np.asarray(rot_all), np.asarray(trans_all)
print("\nrot_err_deg:   mean {:.2f} median {:.2f} frac<30 {:.2f}".format(
    rot_all.mean(), np.median(rot_all), (rot_all < 30).mean()))
print("trans_err_deg: mean {:.2f} median {:.2f} frac<30 {:.2f}".format(
    trans_all.mean(), np.median(trans_all), (trans_all < 30).mean()))
mx = np.maximum(rot_all, trans_all)
print("max(r,t):      frac<5 {:.2f} <10 {:.2f} <20 {:.2f} <30 {:.2f}".format(
    *[(mx < t).mean() for t in (5, 10, 20, 30)]))
