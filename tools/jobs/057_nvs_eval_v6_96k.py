"""NVS generalization eval on the v6 pose-retrain checkpoint at 96k (extension segments).

Runs the full test CLI (mode=test protocol: held-out scenes, held-out
target views, pose-aligned rendering — reference protocol
src/model/model_wrapper.py:323-440) with the newest checkpoint from the
v6 segmented retrain (tools/pose_segments.py). Complements the committed
48k-step v5 numbers (PSNR 12.99 / SSIM 0.246) and the random-init floor
(+6.0 dB gap): this pins whether NVS quality keeps tracking the
still-climbing pose auc@30 out to 72k steps.

Wipe-resilient: if the orbax segment dirs are gone, bootstraps from the
committed f16 npz (outputs/synthetic_pose/ckpt_committed/).
"""
import json
import pathlib
import subprocess
import sys

for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib", "pose_segments")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import pose_segments
from vicasplat_tpu.utils.config import load_config
from vicasplat_tpu.main import test

OUT = "outputs/synthetic_pose/nvs_eval_v6_96k"

cfg = load_config(
    "/root/repo/configs/main.yaml", experiment="synthetic_pose",
    overrides=[
        f"dataset.synthetic.n_scenes={pose_segments.N_SCENES}",
        "dataset.synthetic.augment=true",
        f"test.output_path={OUT}",
    ])
pose_segments.bootstrap_from_committed(cfg)

ckpt = pose_segments.newest_ckpt(7)
print("evaluating ckpt:", ckpt, flush=True)
assert ckpt is not None

cfg = load_config(
    "/root/repo/configs/main.yaml", experiment="synthetic_pose",
    overrides=[
        f"dataset.synthetic.n_scenes={pose_segments.N_SCENES}",
        "dataset.synthetic.augment=true",
        f"checkpointing.load={ckpt}",
        f"test.output_path={OUT}",
    ])
test(cfg)

scores = pathlib.Path("/root/repo") / OUT / "scores_all_avg.json"
if scores.exists():
    print("scores:", scores.read_text(), flush=True)
    subprocess.run(["git", "add", "-f", str(scores.parent)],
                   cwd="/root/repo", check=False, capture_output=True)
    try:
        psnr = json.loads(scores.read_text()).get("psnr")
        msg = (f"NVS test-protocol eval on the v6 96k ckpt: "
               f"held-out-scene PSNR {psnr:.2f}" if psnr is not None else
               "NVS test-protocol eval on the v6 96k ckpt")
    except Exception:
        msg = "NVS test-protocol eval on the v6 96k ckpt"
    r = subprocess.run(["git", "commit", "-m", msg], cwd="/root/repo",
                       check=False, capture_output=True, text=True)
    print("git commit:", (r.stdout or r.stderr).strip()[:200], flush=True)
print("done ->", OUT, flush=True)
