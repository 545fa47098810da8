"""Scene-2 overfit, attempt 3: ramped frame curriculum.

069 (all frames at once) and 071 (step-function unlock every 1500 steps)
both collapsed into the identity-pose minimum; 071's log shows healthy
convergence (PSNR 13.9 at 5 active frames) destroyed exactly when frame 6
switched on at full weight (gnorm spiked to 4e3, PSNR 13.9 -> 5.0, never
recovered). Frames now ramp in linearly over their 1500-step window.
"""
import sys

sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("demo", "tools.overfit_real_scene", "tools")]:
    del sys.modules[m]

from tools.overfit_real_scene import main

main(["--scene", "05b1462991e38e4d", "--size", "128", "--steps", "20000",
      "--log_every", "500", "--frame_curriculum", "1500",
      "--pose_only_warmup"])
