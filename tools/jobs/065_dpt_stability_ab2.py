"""DPT stability A/B, redo after the SSIM NaN fix (round 5).

The first A/B (job 060) was invalidated: BOTH variants had 87.5M NaN
grads from step 0 — not the DPT stack at all, but sqrt'(0)=inf in the
SSIM loss's Cauchy-Schwarz bound on the constant windows of near-empty
random-init renders (fixed in loss/ssim.py with stop_gradient + pinned
by tests). This re-runs the true comparison: (a) plain DPT heads,
(b) DPT heads + DPTConfig.stabilize, 300 steps each at 128^2.
"""
import sys

sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("demo", "tools.overfit_real_scene", "tools")]:
    del sys.modules[m]

from tools.overfit_real_scene import main

print("=== A: dpt heads, NO stabilization ===", flush=True)
try:
    main(["--scene", "6c99592614256138", "--size", "128", "--steps", "300",
          "--log_every", "20", "--heads", "dpt", "--tag", "_dpt_raw2"])
except Exception as e:
    print(f"A raised: {type(e).__name__}: {e}", flush=True)

for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("demo", "tools.overfit_real_scene", "tools")]:
    del sys.modules[m]
from tools.overfit_real_scene import main  # noqa: E402

print("=== B: dpt heads + stabilize ===", flush=True)
main(["--scene", "6c99592614256138", "--size", "128", "--steps", "300",
      "--log_every", "20", "--heads", "dpt", "--dpt_stabilize",
      "--tag", "_dpt_stab2"])
