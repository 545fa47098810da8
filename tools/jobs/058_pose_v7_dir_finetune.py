"""Pose v7: translation-direction auxiliary-loss fine-tune (12k steps).

Held-out rotation is solved (~3 deg) but translation DIRECTION — the other
input to pose-AUC — stalled at ~40 deg across v5/v6. This fine-tunes the
newest v6 checkpoint with loss.camera.trans_dir_weight=1.0 (the new
translation_direction_loss, exactly the angular quantity the metric
scores) and runs the held-out pose eval. Runs after the v6 queue; commits
its own f16 snapshot + summary entry.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib", "pose_segments")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import pose_segments

pose_segments.run_dir_finetune(steps=12000, dir_weight=1.0)
