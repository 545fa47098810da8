"""Drive eval_pose on the TPU with synthetic scenes -> pose_metrics.json."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k.startswith("tests") or k == "eval_pose"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo")

import pathlib
import time

from tests.test_data import make_chunk

root = pathlib.Path("/tmp/tpu_eval_ds")  # reuse the 128^2 synthetic chunks
if not (root / "test").exists():
    root.mkdir(exist_ok=True)
    make_chunk(root, n_scenes=3, n_views=12, hw=(128, 128))

import eval_pose

t0 = time.time()
eval_pose.main([
    "+experiment=_tiny_smoke",
    f"dataset.re10k.roots=[{root}]",
    "output_dir=/root/repo/outputs/tpu_pose_drive",
    "test.output_path=/root/repo/outputs/tpu_pose_drive/test",
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
])
print(f"pose drive done in {time.time()-t0:.1f}s")
out = pathlib.Path("/root/repo/outputs/tpu_pose_drive")
for p in sorted(out.rglob("*.json")):
    print(" ", p.relative_to(out), "->", p.read_text()[:300])
