"""Pose retrain v6 EXTENSION segment 7 (96k total; see tools/pose_segments.py).

The planned 6x12k run ends at 72k with auc@30 still climbing
(~+0.007-0.015/segment); the committed-snapshot design makes continuation
free, so extend the trajectory two more segments before round end.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib", "pose_segments")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import pose_segments

pose_segments.run_segment(7)
