"""Drive the NVS evaluation CLI (main.test) on the TPU with synthetic data:
produces scores.json, benchmark.json, peak_memory.json + rendered frames."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k.startswith("tests")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo")

import json
import pathlib
import shutil
import time

from tests.test_data import make_chunk
from vicasplat_tpu.main import test as run_test
from vicasplat_tpu.utils.config import load_config

root = pathlib.Path("/tmp/tpu_eval_ds")
if not (root / "test").exists():
    root.mkdir(exist_ok=True)
    make_chunk(root, n_scenes=3, n_views=12, hw=(128, 128))

out = pathlib.Path("/root/repo/outputs/tpu_eval_drive")
shutil.rmtree(out, ignore_errors=True)

cfg = load_config(
    "/root/repo/configs/main.yaml",
    experiment="_tiny_smoke",
    overrides=[
        f"dataset.re10k.roots=[{root}]",
        f"output_dir={out}",
        "mode=test",
        "encoder.backbone.img_size=128",
        "encoder.backbone.enc_depth=8",
        "encoder.backbone.enc_embed_dim=512",
        "encoder.backbone.enc_num_heads=8",
        "encoder.backbone.dec_depth=4",
        "encoder.backbone.dec_embed_dim=384",
        "encoder.backbone.dec_num_heads=6",
        "dataset.re10k.input_image_shape=[128,128]",
        "dataset.re10k.view_sampler.num_context_views=4",
        "test.compute_scores=true",
    ],
)
t0 = time.time()
run_test(cfg)
print(f"eval drive done in {time.time()-t0:.1f}s")
for p in sorted(out.rglob("*.json")):
    print(" ", p.relative_to(out), "->", p.read_text()[:200])
