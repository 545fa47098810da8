"""Held-out novel-view quality proof, scene 2 (VERDICT r3 #1).

SHARED config for both scenes (the r3 runs differed: 05b14 used the ramped
curriculum + pose-only warm-up = 2 renders/step = 8.2 it/s, 6c995 ran plain
at 24.0 it/s — that, not hardware, was the "3x it/s discrepancy").
Frames 2 and 5 are excluded from the photometric loss (the model still
ingests all 8); final metrics report held-out PSNR/SSIM vs the mean-image /
nearest-train-frame baselines plus the local-pose-refinement consistency
probe. Same 30k steps, same flags.
"""
import sys

sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("demo", "tools.overfit_real_scene", "tools")]:
    del sys.modules[m]

from tools.overfit_real_scene import main

main(["--scene", "05b1462991e38e4d", "--size", "128", "--steps", "30000",
      "--log_every", "500", "--frame_curriculum", "1500",
      "--pose_only_warmup", "--holdout", "2,5", "--save_ckpt",
      "--tag", "_holdout"])
