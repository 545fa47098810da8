"""Scene-1 overfit with the ramped frame curriculum + pose-only warm-up
that made scene 2 converge (jobs 069/071/075): scene 1's earlier runs
(064: 4k steps PSNR ~15.9; 066: 20k steps PSNR 18.0) predate the
curriculum. Refresh the committed quality artifact with the better recipe.
"""
import sys

sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("demo", "tools.overfit_real_scene", "tools")]:
    del sys.modules[m]

from tools.overfit_real_scene import main

main(["--scene", "6c99592614256138", "--size", "128", "--steps", "20000",
      "--log_every", "500", "--frame_curriculum", "1500",
      "--pose_only_warmup"])
