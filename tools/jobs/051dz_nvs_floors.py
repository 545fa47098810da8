"""NVS floors + cap sensitivity for the 48k trained-synthetic eval (job 052).

Job 052 reported held-out-scene PSNR 12.99 / SSIM 0.246 at 48k steps, but
committed no floor to compare against, and every render hit the
max_per_tile=256 cap (coverage_tile_overflow_frac 1.0). Two quick evals:

1. random-init weights, identical protocol -> the "untrained" floor the
   trained number must beat (mirrors the pose proof's random baseline).
2. trained 48k ckpt at max_per_tile=1024 -> does lifting the serve-time
   cap above the train-time cap help or hurt? (Round-4 finding on the
   real-scene ckpt: the model trains THROUGH the caps and compensates, so
   train/serve cap consistency is the invariant — verify it holds here.)
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

print("=== 1/2 random-init floor (same protocol, no ckpt) ===", flush=True)
cfg = load_config(
    "/root/repo/configs/main.yaml", experiment="synthetic_pose",
    overrides=base + [
        "test.output_path=outputs/synthetic_pose/nvs_eval_random_floor",
    ])
test(cfg)

print("=== 2/2 trained 48k ckpt, max_per_tile 256 -> 1024 ===", flush=True)
ckpt = pose_segments.newest_ckpt(3)  # the 48k ckpt job 052 evaluated
print("ckpt:", ckpt, flush=True)
assert ckpt is not None and "seg3" in ckpt
cfg = load_config(
    "/root/repo/configs/main.yaml", experiment="synthetic_pose",
    overrides=base + [
        f"checkpointing.load={ckpt}",
        "decoder.rasterize.max_per_tile=1024",
        "test.output_path=outputs/synthetic_pose/nvs_eval_trained_k1024",
    ])
test(cfg)
print("done -> nvs_eval_random_floor + nvs_eval_trained_k1024", flush=True)
