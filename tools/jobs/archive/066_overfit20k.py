"""Long overfit on scene 6c99592614256138: 20k steps at 128px (PSNR was
15.8 and still climbing at 4k steps / 213 s; 20k ~= 18 min)."""
import sys

sys.path.insert(0, "/root/repo")

from tools.overfit_real_scene import main

main(["--size", "128", "--steps", "20000", "--log_every", "500"])
