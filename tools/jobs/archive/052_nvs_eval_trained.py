"""NVS generalization table from real learning: run the full test CLI
(mode=test protocol: held-out scenes, held-out target views, pose-aligned
rendering) with the newest segmented-retrain checkpoint (jobs 051a-d).

Complements the pose-AUC number: until now every committed NVS metrics
table came from random weights (drive proof) or single-scene overfits.
Reference protocol: src/model/model_wrapper.py:323-440.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib", "pose_segments")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import pose_segments
from vicasplat_tpu.utils.config import load_config
from vicasplat_tpu.main import test

ckpt = pose_segments.newest_ckpt(pose_segments.N_SEGMENTS - 1)
print("evaluating ckpt:", ckpt, flush=True)
assert ckpt is not None

cfg = load_config(
    "/root/repo/configs/main.yaml", experiment="synthetic_pose",
    overrides=[
        f"dataset.synthetic.n_scenes={pose_segments.N_SCENES}",
        "dataset.synthetic.augment=true",
        f"checkpointing.load={ckpt}",
        "test.output_path=outputs/synthetic_pose/nvs_eval_trained",
    ])
test(cfg)
print("done -> outputs/synthetic_pose/nvs_eval_trained", flush=True)
