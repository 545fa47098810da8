"""Drive the real train CLI on the TPU: a mid-size model on synthetic data,
30 steps with a validation pass + full-state checkpoints. Proves the whole
training runtime (data pipeline, jit step, staging, TB logging, visuals,
orbax checkpoints) on real hardware; artifacts under outputs/tpu_drive.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k.startswith("tests")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo")

import pathlib
import shutil
import time

from tests.test_data import make_chunk
from vicasplat_tpu.main import train
from vicasplat_tpu.utils.config import load_config

root = pathlib.Path("/tmp/tpu_drive_ds")
if not (root / "test").exists():
    root.mkdir(exist_ok=True)
    make_chunk(root, n_scenes=4, n_views=16, hw=(128, 128))

out = pathlib.Path("/root/repo/outputs/tpu_drive")
shutil.rmtree(out, ignore_errors=True)

cfg = load_config(
    "/root/repo/configs/main.yaml",
    experiment="_tiny_smoke",
    overrides=[
        f"dataset.re10k.roots=[{root}]",
        f"checkpointing.output_dir={out}/ckpts",
        f"output_dir={out}",
        "trainer.max_steps=30",
        "trainer.val_check_interval=20",
        "checkpointing.every_n_train_steps=25",
        "checkpointing.save_weights_only=false",
        # mid-size model on 128^2 images
        "encoder.backbone.img_size=128",
        "encoder.backbone.enc_depth=12",
        "encoder.backbone.enc_embed_dim=768",
        "encoder.backbone.enc_num_heads=12",
        "encoder.backbone.dec_depth=6",
        "encoder.backbone.dec_embed_dim=512",
        "encoder.backbone.dec_num_heads=8",
        "dataset.re10k.input_image_shape=[128,128]",
        "trainer.precision=bfloat16",
    ],
)
t0 = time.time()
train(cfg)
dt = time.time() - t0
ck = sorted((out / "ckpts").glob("step_*"))
val = sorted((out / "val").glob("step_*"))
print(f"train drive done in {dt:.1f}s; checkpoints={len(ck)} val_dirs={len(val)}")
for d in val:
    print(" val:", sorted(p.name for p in d.iterdir()))
