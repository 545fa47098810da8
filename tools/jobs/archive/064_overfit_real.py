"""Self-supervised overfit on real bundled scene 6c99592614256138 (128px,
4000 steps) — quality proof on real pixels. Artifacts to
outputs/real_scene_overfit/."""
import sys

sys.path.insert(0, "/root/repo")

from tools.overfit_real_scene import main

main(["--size", "128", "--steps", "4000", "--log_every", "100"])
