"""Regenerate outputs/tpu_eval_proof with the NaN-proofed metrics.

Round-2's committed artifact predates the degenerate-trajectory guards:
scores_all_avg.json carried "ate": NaN and benchmark.json was compile-
polluted at count=3. The eval CLI now returns None for unidentifiable
trajectories (nanmean + n_valid summaries) and the benchmarker emits
mean_warm_s. Same synthetic 3-scene drive as round 2 (no real RE10K in
this environment).
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k.startswith("tests")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo")

import contextlib
import io
import json
import pathlib
import shutil
import time

from tests.test_data import make_chunk
from vicasplat_tpu.main import test as run_test
from vicasplat_tpu.utils.config import load_config

root = pathlib.Path("/tmp/tpu_eval_ds2")
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
        "dataset.re10k.view_sampler.num_target_views=2",
        "dataset.re10k.view_sampler.min_distance_between_context_views=1",
        "dataset.re10k.view_sampler.max_distance_between_context_views=2",
        "test.output_path=/root/repo/outputs/tpu_eval_drive/test",
        "test.compute_scores=true",
    ],
)
log = io.StringIO()
t0 = time.time()
with contextlib.redirect_stdout(log):
    run_test(cfg)
wall = time.time() - t0
print(log.getvalue()[-2000:])
print(f"eval drive done in {wall:.1f}s")

proof = pathlib.Path("/root/repo/outputs/tpu_eval_proof")
proof.mkdir(parents=True, exist_ok=True)
test_dir = out / "test"
for name in ("scores_all_avg.json", "benchmark.json"):
    src = next(iter(out.rglob(name)), None)
    assert src is not None, f"{name} not produced"
    shutil.copy(src, proof / name)
(proof / "run.log").write_text(log.getvalue() + f"\neval drive done in {wall:.1f}s\n")

scores = json.loads((proof / "scores_all_avg.json").read_text())
print("committed summary:", scores)
bad = [k for k, v in scores.items()
       if isinstance(v, float) and v != v]
assert not bad, f"NaN still present: {bad}"
print("NaN-free: ok")
