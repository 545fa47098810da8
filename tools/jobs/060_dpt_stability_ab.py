"""DPT-head random-init stability A/B on the real scene (round 5; judge r4
weak #4 step 1). 120 steps each at the documented divergence condition
(lr 1e-4, clip 0.25, real images): (a) plain DPT heads — expected to blow
up (the recorded "inf activations within 5 steps"); (b) DPT heads with
DPTConfig.stabilize (RCU LayerScale + trunk LayerNorm). Records both loss
trails; the 256² holdout run (job 014) only makes sense if (b) is stable.
"""
import sys

sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("demo", "tools.overfit_real_scene", "tools")]:
    del sys.modules[m]

from tools.overfit_real_scene import main

print("=== A: dpt heads, NO stabilization ===", flush=True)
try:
    main(["--scene", "6c99592614256138", "--size", "128", "--steps", "120",
          "--log_every", "10", "--heads", "dpt", "--tag", "_dpt_raw"])
except Exception as e:  # divergence may surface as an exception
    print(f"A raised: {type(e).__name__}: {e}", flush=True)

for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("demo", "tools.overfit_real_scene", "tools")]:
    del sys.modules[m]
from tools.overfit_real_scene import main  # noqa: E402

print("=== B: dpt heads + stabilize ===", flush=True)
main(["--scene", "6c99592614256138", "--size", "128", "--steps", "120",
      "--log_every", "10", "--heads", "dpt", "--dpt_stabilize",
      "--tag", "_dpt_stab"])
