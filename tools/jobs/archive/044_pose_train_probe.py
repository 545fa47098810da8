"""Train-scene memorization probe for the 512-scene diversity ckpt (job 040).

Job 040 trained 512-scene + x-flip and measured held-out auc@30 = 0.173
(committed), but its train-probe tail crashed on a stale make_view_sampler
signature before writing the train/test split comparison. This re-runs just
the probe from the saved ckpt and merges it into the committed summary.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import dataclasses as _dc
import json
import pathlib

import jax
import numpy as np

from vicasplat_tpu.utils.config import load_config
from vicasplat_tpu.data.synthetic_scenes import (
    DatasetSyntheticScenes, SyntheticScenesConfig,
)
from vicasplat_tpu.data.view_samplers import make_view_sampler
from vicasplat_tpu.evaluation.pose_evaluator import PoseEvalConfig, PoseEvaluator
from vicasplat_tpu.models import init_vicasplat
from vicasplat_tpu.utils.checkpointing import CheckpointManager, load_weights

cfg = load_config(
    "/root/repo/configs/main.yaml", experiment="synthetic_pose",
    overrides=["dataset.synthetic.n_scenes=512",
               "dataset.synthetic.augment=true"])

out_root = pathlib.Path("/root/repo/outputs/tpu_pose_proof/v2_synthetic")
ckpt_dir = pathlib.Path("/root/repo/outputs/synthetic_pose/ckpts_v3")
latest = CheckpointManager(str(ckpt_dir), keep=5).latest()
print("ckpt:", latest, flush=True)
params = load_weights(
    str(latest), template=init_vicasplat(jax.random.PRNGKey(0), cfg.encoder))

ev_tr = PoseEvaluator(params, cfg.encoder, cfg.decoder,
                      PoseEvalConfig(output_path=str(out_root / "train_probe")))

d = dict(cfg.dataset["synthetic"])
samp = d.pop("view_sampler")
fields = {f.name for f in _dc.fields(SyntheticScenesConfig)}
scfg = SyntheticScenesConfig(**{
    k: tuple(v) if isinstance(v, list) else v
    for k, v in d.items() if k in fields})
ds = DatasetSyntheticScenes(
    scfg, "test", make_view_sampler(dict(samp), "test", None), seed=3)
ds.ids = list(range(8))  # TRAIN scenes through the test protocol
for sid_ex in ds:
    b = {k: (np.asarray(v)[None] if not isinstance(v, (dict, str)) else v)
         for k, v in sid_ex.items()}
    b["context"] = {k: np.asarray(v)[None] for k, v in sid_ex["context"].items()}
    b["target"] = {k: np.asarray(v)[None] for k, v in sid_ex["target"].items()}
    b["scene"] = [sid_ex["scene"]]
    r = ev_tr.evaluate_batch(b)
    print(f"[train {r['scene']}] ate={r['ate']:.4f}", flush=True)
ev_tr.dump()
rot_t = np.asarray(ev_tr.metrics["rot_err_deg"])
trans_t = np.asarray(ev_tr.metrics["trans_err_deg"])
probe = {"rot_err_mean_deg": float(rot_t.mean()),
         "trans_err_mean_deg": float(trans_t.mean()),
         "trans_err_frac_lt30": float((trans_t < 30).mean())}
print("TRAIN probe:", probe, flush=True)

summary_path = out_root / "summary.json"
prev = json.loads(summary_path.read_text())
prev["train_probe_512"] = dict(probe, note=(
    "8 train scenes through the test protocol (job 044); compare with the "
    "held-out 'trained' block — the train/test gap measures residual "
    "memorization at 512 scenes"))
summary_path.write_text(json.dumps(prev, indent=2))
print("merged into", summary_path, flush=True)
