"""Pose-AUC proof: train across synthetic multi-scene data, eval held-out
scenes (VERDICT r3 #2).

Trains the synthetic_pose config (data/synthetic_scenes.py: 64 procedural
scenes with exact GT cameras, camera-dq + photometric losses) through the
REAL train CLI path, then runs the PoseEvaluator (the eval_pose stack:
ATE/RPE/pose-AUC, reference src/evaluation/pose_evaluator.py:34-245) on the
8 HELD-OUT test scenes — once with random init (chance baseline) and once
with the trained checkpoint. Success = trained auc@30 meaningfully above
the random baseline. Artifacts -> outputs/tpu_pose_proof/v2_synthetic/.
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

cfg = load_config("/root/repo/configs/main.yaml", experiment="synthetic_pose")

out_root = pathlib.Path("/root/repo/outputs/tpu_pose_proof/v2_synthetic")
out_root.mkdir(parents=True, exist_ok=True)


def eval_pose(params, tag):
    ev = PoseEvaluator(
        params, cfg.encoder, cfg.decoder,
        PoseEvalConfig(output_path=str(out_root / tag)),
    )
    dm = DataModule(cfg.dataset, cfg.data_loader, None)
    loader = dm.test_dataloader()
    for i, batch in enumerate(loader):
        r = ev.evaluate_batch(batch)
        print(f"[{tag} {i}] {r['scene']}: ate={r['ate']:.4f} "
              f"rpe_r={r['rpe_rot']:.3f}", flush=True)
    loader.close()
    ev.dump()
    s = ev.summary()
    print(f"{tag} summary:", {k: round(v, 4) for k, v in s.items()},
          flush=True)
    return s


# 1) chance baseline: random-init weights (what r3's tpu_pose_proof showed)
rand_params = init_vicasplat(jax.random.PRNGKey(cfg.seed), cfg.encoder)
base = eval_pose(rand_params, "random_baseline")
del rand_params

# 2) train (full CLI train loop: DP mesh, checkpointing, val renders)
train(cfg)

# 3) trained eval on the held-out scenes
from vicasplat_tpu.utils.checkpointing import CheckpointManager, load_weights

ckpt_dir = pathlib.Path("/root/repo") / cfg.checkpointing.output_dir
latest = CheckpointManager(str(ckpt_dir), keep=5).latest()
print("loading trained ckpt:", latest, flush=True)
params = load_weights(
    str(latest), template=init_vicasplat(jax.random.PRNGKey(0), cfg.encoder))
trained = eval_pose(params, "trained")

with open(out_root / "summary.json", "w") as f:
    json.dump({"random_baseline": base, "trained": trained,
               "n_test_scenes": 8,
               "config": "configs/experiment/synthetic_pose.yaml"}, f,
              indent=2)
print("auc@30 random", base.get("auc@30"), "-> trained",
      trained.get("auc@30"), flush=True)
