"""Pose retrain v6 segment 1/6 (12k steps; see tools/pose_segments.py).

v5's 48k-step run (auc@30 0.258, still climbing) lost its weights to a VM
wipe; v6 re-runs the recipe committing an f16 snapshot per segment so the
trajectory can be CONTINUED next round instead of re-derived.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib", "pose_segments")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import pose_segments

pose_segments.run_segment(1)
