"""NVS generalization table from real learning: run the full test CLI
(mode=test protocol: held-out scenes, held-out target views, pose-aligned
rendering) with the 512-scene-trained checkpoint (ckpts_v3, job 040).

Complements the pose-AUC number: until now every committed NVS metrics
table came from random weights (drive proof) or single-scene overfits.
If job 045's 2048-scene ckpt exists by the time this runs, prefer it.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import pathlib

from vicasplat_tpu.utils.config import load_config
from vicasplat_tpu.utils.checkpointing import CheckpointManager
from vicasplat_tpu.main import test

ckpt = None
for d in ("outputs/synthetic_pose/ckpts_v4", "outputs/synthetic_pose/ckpts_v3"):
    latest = CheckpointManager(str(pathlib.Path("/root/repo") / d), keep=5).latest()
    if latest is not None:
        ckpt = str(latest)
        break
print("evaluating ckpt:", ckpt, flush=True)
assert ckpt is not None

n_scenes = "2048" if "ckpts_v4" in ckpt else "512"
cfg = load_config(
    "/root/repo/configs/main.yaml", experiment="synthetic_pose",
    overrides=[
        f"dataset.synthetic.n_scenes={n_scenes}",
        "dataset.synthetic.augment=true",
        f"checkpointing.load={ckpt}",
        "test.output_path=outputs/synthetic_pose/nvs_eval_trained",
    ])
test(cfg)
print("done -> outputs/synthetic_pose/nvs_eval_trained", flush=True)
