"""Scene-2 held-out proof, re-run after the SSIM gradient fix (round 5).

The committed scene-2 holdout (job 031) stalled at its mean-image floor
raw (+1.8/+4.6 dB only after pose refine). Round-5 root-cause: the SSIM
loss's Cauchy-Schwarz bound emitted inf*0=NaN gradients on constant
windows — and scene 05b14's early renders are exactly the near-empty case
(job 063's joint run collapsed on it outright). Post-fix, the same shared
config may train materially better. Same flags, 16k steps (fits the round; the post-fix signal shows early), new tag.
"""
import sys

sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("demo", "tools.overfit_real_scene", "tools")]:
    del sys.modules[m]

from tools.overfit_real_scene import main

main(["--scene", "05b1462991e38e4d", "--size", "128", "--steps", "16000",
     "--log_every", "1000", "--frame_curriculum", "1500",
     "--pose_only_warmup", "--holdout", "2,5", "--save_ckpt",
     "--tag", "_holdout_v2"])
