"""Pose retrain segment 3/4 (12k steps; see tools/pose_segments.py)."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib", "pose_segments")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import pose_segments

pose_segments.run_segment(3)
