"""Pose v7b: continue the direction fine-tune from the v7 ckpt (108k total)
with trans_dir_weight=4.0 for 12k more steps. v7 (weight 1.0) moved the
catastrophic-gauge tail (87/136 deg scenes -> 33/40) and mean direction
36.3 -> 29.7 deg but left the 10-25 deg per-scene gauge bulk; this tests
whether a stronger direct penalty moves the bulk or the dq L1 floor is
binding. Evals + commits its own npz/summary entry (tag *_v7b).
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib", "pose_segments")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import pose_segments

pose_segments.run_dir_finetune(
    steps=12000, dir_weight=4.0,
    base_ckpt_dir="/root/repo/outputs/synthetic_pose/ckpts_v7_dir",
    base_steps_k=108, version_tag="v7b")
