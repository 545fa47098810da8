"""NVS random-init floor for the 48k trained-synthetic eval (job 052).

Job 052 reported held-out-scene PSNR 12.99 / SSIM 0.246 at 48k steps but
committed no floor to compare against. This runs the identical test
protocol with random-init weights -> the "untrained" floor the trained
number must beat (mirrors the pose proof's random baseline).

The original second half of this job (trained ckpt at max_per_tile=1024)
is DROPPED: the 08-20 VM recreation lost outputs/synthetic_pose/ckpts_v5_*
(uncommitted, ~GB-scale), so the 48k checkpoint no longer exists. The
train/serve cap-consistency finding stands on the real-scene ckpt evidence
(tools/jobs/archive/033b, DESIGN.md §5).
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib", "pose_segments")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import pose_segments
from vicasplat_tpu.utils.config import load_config
from vicasplat_tpu.main import test

base = [
    f"dataset.synthetic.n_scenes={pose_segments.N_SCENES}",
    "dataset.synthetic.augment=true",
]

print("=== random-init floor (same protocol as job 052, no ckpt) ===", flush=True)
cfg = load_config(
    "/root/repo/configs/main.yaml", experiment="synthetic_pose",
    overrides=base + [
        "test.output_path=outputs/synthetic_pose/nvs_eval_random_floor",
    ])
test(cfg)
print("done -> outputs/synthetic_pose/nvs_eval_random_floor", flush=True)
