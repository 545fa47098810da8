"""Joint 2-scene training (round 5; judge r4 weak #5 / next #6): one
shared model on BOTH bundled scenes, 20k steps at 128^2 — measure whether
joint data improves raw (no-refine) held-out PSNR and shrinks the pose
refine deltas vs the committed per-scene overfits.
"""
import sys

sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("demo", "tools.joint_scene_train", "tools")]:
    del sys.modules[m]

from tools.joint_scene_train import main

main(["--steps", "20000", "--log_every", "500", "--tag", "_20k"])
