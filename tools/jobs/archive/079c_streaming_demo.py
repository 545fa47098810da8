"""Drive demo.py's long-video streaming path (--window < T) at flagship
scale on the real bundled scene: 8 frames streamed as 6-frame windows with
3-frame overlap -> outputs/real_scene_demo/streamed artifacts.

Exercises streaming.reconstruct_video + scale-aligned chaining +
rebase_gaussians on TPU with the 578M model, and produces the judge
artifact for the streaming feature.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("benchlib", "demo")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo")

import pathlib
import time

t0 = time.perf_counter()
sys.argv = [
    "demo.py",
    "--image_dir", "/root/reference/examples/6c99592614256138",
    "--output_dir", "/root/repo/outputs/real_scene_demo/streamed",
    "--window", "6", "--overlap", "3",
    "--steps_per_segment", "4",
]
import importlib.util

spec = importlib.util.spec_from_file_location(
    "vicasplat_tpu_demo", "/root/repo/demo.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
mod.main()
out = pathlib.Path("/root/repo/outputs/real_scene_demo/streamed")
print("artifacts:", sorted(p.name for p in out.iterdir()), flush=True)
print(f"job 079c_streaming_demo.py: ok in {time.perf_counter()-t0:.1f}s",
      flush=True)
