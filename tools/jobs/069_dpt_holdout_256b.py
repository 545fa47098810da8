"""256^2 DPT holdout, attempt 2 (round 5): --scale_act bounded.

Attempt 1 (job 066) had gnorm EXACTLY 0 for all 8k steps: with the
reference's 0.001*softplus scale map, this init draw's splats are all
sub-pixel/culled at 256^2, so the render carries no parameter gradient at
all (loss drifted only via AdamW weight decay). The bounded scale map
(0.005-0.04) keeps random-init splats visible; stabilized DPT heads
otherwise identical. 8k steps, holdout 2,5.
"""
import sys

sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("demo", "tools.overfit_real_scene", "tools")]:
    del sys.modules[m]

from tools.overfit_real_scene import main

main(["--scene", "6c99592614256138", "--size", "256", "--steps", "8000",
      "--log_every", "500", "--frame_curriculum", "600",
      "--pose_only_warmup", "--holdout", "2,5", "--save_ckpt",
      "--heads", "dpt", "--dpt_stabilize", "--scale_act", "bounded",
      "--tag", "_dpt256b"])
