"""Retry the second bundled real scene with the frame curriculum.

Run 069 (all 8 frames from step 0) diverged on this scene: poses ran away
(spread 2.63) and frames 1..7 rendered nothing (PSNR stuck at 5.06 while
frame 0 hit 21.8). Frames now unlock progressively — {0,1} from step 0,
one more every 1500 steps (all 8 by step 9000), 20k total.
"""
import sys

sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("demo", "tools.overfit_real_scene")]:
    del sys.modules[m]

from tools.overfit_real_scene import main

main(["--scene", "05b1462991e38e4d", "--size", "128", "--steps", "20000",
      "--log_every", "500", "--frame_curriculum", "1500"])
