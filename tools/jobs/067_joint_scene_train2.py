"""Joint 2-scene training, redo after the SSIM NaN fix (round 5).

Job 063 collapsed (loss frozen, gnorm ~1e-4, PSNR = random floor): the
pre-fix SSIM backward NaN'd on scene 05b14's near-empty initial render
and the guard zeroed essentially ALL shared-model gradients every step —
the single-scene runs dodged it only because scene 6c995's init render
has no constant windows. With the stop_gradient fix (loss/ssim.py) the
joint gradients are finite; this re-runs the experiment.
"""
import sys

sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("demo", "tools.joint_scene_train", "tools")]:
    del sys.modules[m]

from tools.joint_scene_train import main

main(["--steps", "20000", "--log_every", "500", "--tag", "_20k_v2"])
