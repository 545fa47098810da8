"""Pose-AUC scale-up: 2048 scenes (+x-flip = ~4096 effective), 24k steps.

Job 040 established the scaling direction: 64 scenes memorize (test trans
dir at chance), 512 scenes generalize to auc@30 = 0.173 (rot 4.5 deg, 42%
of translation directions < 30 deg). This quadruples scene diversity and
extends training to see whether translation-direction generalization keeps
scaling — the reference's pose-AUC north star (BASELINE.md) is the metric.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import json
import pathlib

import jax
import numpy as np

from vicasplat_tpu.utils.config import load_config
from vicasplat_tpu.main import train
from vicasplat_tpu.data import DataModule
from vicasplat_tpu.evaluation.pose_evaluator import PoseEvalConfig, PoseEvaluator
from vicasplat_tpu.models import init_vicasplat

cfg = load_config(
    "/root/repo/configs/main.yaml", experiment="synthetic_pose",
    overrides=[
        "dataset.synthetic.n_scenes=2048",
        "dataset.synthetic.augment=true",
        "loss.camera.weight=2.0",
        "optimizer.max_steps=24000",
        "trainer.max_steps=24000",
        "checkpointing.every_n_train_steps=6000",
        "checkpointing.output_dir=outputs/synthetic_pose/ckpts_v4",
        "output_dir=outputs/synthetic_pose_v4",
        "test.output_path=outputs/synthetic_pose_v4/eval",
    ])

out_root = pathlib.Path("/root/repo/outputs/tpu_pose_proof/v2_synthetic")

train(cfg)

from vicasplat_tpu.utils.checkpointing import CheckpointManager, load_weights

ckpt_dir = pathlib.Path("/root/repo") / cfg.checkpointing.output_dir
latest = CheckpointManager(str(ckpt_dir), keep=5).latest()
print("loading trained ckpt:", latest, flush=True)
params = load_weights(
    str(latest), template=init_vicasplat(jax.random.PRNGKey(0), cfg.encoder))

ev = PoseEvaluator(params, cfg.encoder, cfg.decoder,
                   PoseEvalConfig(output_path=str(out_root / "trained_2048")))
dm = DataModule(cfg.dataset, cfg.data_loader, None)
loader = dm.test_dataloader()
for i, batch in enumerate(loader):
    r = ev.evaluate_batch(batch)
    print(f"[test {i}] {r['scene']}: ate={r['ate']:.4f} "
          f"rpe_r={r['rpe_rot']:.3f}", flush=True)
loader.close()
ev.dump()
s = ev.summary()
rot = np.asarray(ev.metrics["rot_err_deg"])
trans = np.asarray(ev.metrics["trans_err_deg"])
s["rot_err_mean_deg"] = float(rot.mean())
s["rot_err_frac_lt30"] = float((rot < 30).mean())
s["trans_err_mean_deg"] = float(trans.mean())
s["trans_err_frac_lt30"] = float((trans < 30).mean())
print("TEST summary:", {k: round(v, 4) for k, v in s.items()}, flush=True)

summary_path = out_root / "summary.json"
prev = json.loads(summary_path.read_text())
prev["trained_2048scenes_24k"] = dict(
    s, config="synthetic_pose + 2048 scenes + x-flip + camera weight 2.0 "
              "+ 24k steps (job 045, ckpt outputs/synthetic_pose/ckpts_v4)")
summary_path.write_text(json.dumps(prev, indent=2))
print("auc@30 (2048 scenes):", s.get("auc@30"), flush=True)
