"""Pose retrain segment 5 (72k total) — final extension this round.

auc@30 trajectory 0.227 (12k) -> 0.234 (24k) -> 0.251 (36k) is still
climbing ~+0.015/segment with train PSNR rising; one more 12k segment is
the cheapest remaining quality lever. Runs after 052 (next worker pass).
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib", "pose_segments")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import pose_segments

pose_segments.run_segment(5)
