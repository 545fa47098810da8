"""Gauge-structure diagnostic on the v7 direction-finetuned checkpoint:
re-run tools/diag_trans_dir.py against ckpts_v7_dir so the per-scene
gauge-rotation analysis (raw vs Kabsch-corrected auc) is directly
comparable with the committed v6 baseline (diag_trans_dir.json:
raw auc@30 0.242 -> corrected 0.586). Commits the artifact.
"""
import subprocess
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("pose_segments", "diag_trans_dir")]:
    del sys.modules[m]

from diag_trans_dir import main

main(["--ckpt_dir", "/root/repo/outputs/synthetic_pose/ckpts_v7_dir",
      "--out_name", "diag_trans_dir_v7.json"])
subprocess.run(
    ["git", "add", "-f",
     "outputs/tpu_pose_proof/v2_synthetic/diag_trans_dir_v7.json"],
    cwd="/root/repo", check=False, capture_output=True)
r = subprocess.run(
    ["git", "commit", "-m",
     "Gauge diagnostic on the v7 direction-finetuned ckpt"],
    cwd="/root/repo", check=False, capture_output=True, text=True)
print("git commit:", (r.stdout or r.stderr).strip()[:150], flush=True)
