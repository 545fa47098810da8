"""Overfit proof on the SECOND bundled real scene (05b1462991e38e4d),
20k steps at 128px — same recipe that reached PSNR 18.0 on the first."""
import sys

sys.path.insert(0, "/root/repo")

from tools.overfit_real_scene import main

main(["--scene", "05b1462991e38e4d", "--size", "128", "--steps", "20000",
      "--log_every", "500"])
