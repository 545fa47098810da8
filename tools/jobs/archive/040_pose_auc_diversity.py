"""Pose-AUC attempt 3: scene DIVERSITY (VERDICT r3 #2).

Diagnosis chain: job 032 (4k steps) — rotation learned, translation
direction chance; job 035 (16k steps, camera weight 2.0) — auc@30 0.03,
trans still ~80 deg; tools/diag_pose_train_vs_test.py on 035's ckpt —
TRAIN scenes are PERFECT (rot 0.11 / trans 0.27 deg) while TEST scenes sit
at 81 deg: the 64-scene pool is memorized, not learned from.

This run: 512 scenes + x-reflection augmentation (~1024 effective), 20k
steps, camera weight 2.0. Reports the train/test error split so the
memorization-vs-generalization picture is explicit.
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
        "dataset.synthetic.n_scenes=512",
        "dataset.synthetic.augment=true",
        "loss.camera.weight=2.0",
        "optimizer.max_steps=20000",
        "trainer.max_steps=20000",
        "checkpointing.every_n_train_steps=5000",
        "checkpointing.output_dir=outputs/synthetic_pose/ckpts_v3",
        "output_dir=outputs/synthetic_pose_v3",
        "test.output_path=outputs/synthetic_pose_v3/eval",
    ])

out_root = pathlib.Path("/root/repo/outputs/tpu_pose_proof/v2_synthetic")
out_root.mkdir(parents=True, exist_ok=True)

train(cfg)

from vicasplat_tpu.utils.checkpointing import CheckpointManager, load_weights

ckpt_dir = pathlib.Path("/root/repo") / cfg.checkpointing.output_dir
latest = CheckpointManager(str(ckpt_dir), keep=5).latest()
print("loading trained ckpt:", latest, flush=True)
params = load_weights(
    str(latest), template=init_vicasplat(jax.random.PRNGKey(0), cfg.encoder))

ev = PoseEvaluator(params, cfg.encoder, cfg.decoder,
                   PoseEvalConfig(output_path=str(out_root / "trained")))
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

# train-split probe through the same evaluator (memorization check)
ev_tr = PoseEvaluator(params, cfg.encoder, cfg.decoder,
                      PoseEvalConfig(output_path=str(out_root / "train_probe")))
import dataclasses as _dc

from vicasplat_tpu.data.synthetic_scenes import (
    DatasetSyntheticScenes, SyntheticScenesConfig,
)
from vicasplat_tpu.data.view_samplers import make_view_sampler

d = dict(cfg.dataset["synthetic"])
samp = d.pop("view_sampler")
fields = {f.name for f in _dc.fields(SyntheticScenesConfig)}
scfg = SyntheticScenesConfig(**{
    k: tuple(v) if isinstance(v, list) else v
    for k, v in d.items() if k in fields})
ds = DatasetSyntheticScenes(
    scfg, "test", make_view_sampler(dict(samp), "test", None, False), seed=3)
ds.ids = list(range(8))  # TRAIN scenes through the test protocol
for sid_ex in ds:
    b = {k: (np.asarray(v)[None] if not isinstance(v, (dict, str)) else v)
         for k, v in sid_ex.items()}
    b["context"] = {k: np.asarray(v)[None] for k, v in sid_ex["context"].items()}
    b["target"] = {k: np.asarray(v)[None] for k, v in sid_ex["target"].items()}
    b["scene"] = [sid_ex["scene"]]
    ev_tr.evaluate_batch(b)
rot_t = np.asarray(ev_tr.metrics["rot_err_deg"])
trans_t = np.asarray(ev_tr.metrics["trans_err_deg"])
print(f"TRAIN probe: rot mean {rot_t.mean():.2f} | trans mean "
      f"{trans_t.mean():.2f} frac<30 {(trans_t < 30).mean():.2f}", flush=True)

summary_path = out_root / "summary.json"
prev = json.loads(summary_path.read_text()) if summary_path.exists() else {}
prev.update({
    "trained": s,
    "train_probe": {"rot_err_mean_deg": float(rot_t.mean()),
                    "trans_err_mean_deg": float(trans_t.mean()),
                    "trans_err_frac_lt30": float((trans_t < 30).mean())},
    "n_test_scenes": 8,
    "config": "synthetic_pose + 512 scenes + x-flip augment + camera "
              "weight 2.0 + 20k steps (job 040)",
})
with open(summary_path, "w") as f:
    json.dump(prev, f, indent=2)
print("auc@30 trained:", s.get("auc@30"), flush=True)
