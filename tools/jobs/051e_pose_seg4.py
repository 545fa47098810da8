"""Pose retrain segment 4 (extension past the planned 48k; 60k total).

Queued after seg1 showed auc@30 still rising (0.227 @12k -> 0.234 @24k)
and train PSNR still falling — optimization length remains a live lever.
Runs AFTER job 052 (the worker snapshots its queue once per pass), so the
48k NVS eval is unaffected.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib", "pose_segments")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import pose_segments

pose_segments.run_segment(4)
