"""Int8 W8A8 serving on TRAINED weights: task-space error (VERDICT r3 #6).

Round 3 validated int8 only on random weights (output corr 0.9917 — not a
task metric). Here: load the held-out overfit checkpoint (job 030), run the
bf16 and the int8-quantized forward+render on the REAL scene, and report
render PSNR vs the ground-truth frames for both — the honest quality cost
of W8A8 — plus forward latency both ways.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")
          or k in ("benchlib", "demo")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import json
import pathlib
import pickle

import jax
import jax.numpy as jnp
import numpy as np
from benchlib import device_time

from demo import load_images
from vicasplat_tpu.decoder.splatting import (
    DecoderSplattingConfig, decoder_forward,
)
from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig, vicasplat_forward,
)
from vicasplat_tpu.ops.quant import quantize_tree

scene = "6c99592614256138"
ck_path = pathlib.Path(
    f"/root/repo/outputs/real_scene_overfit/{scene}_holdout/ckpt.pkl")
assert ck_path.exists(), f"run job 030 first ({ck_path} missing)"
with open(ck_path, "rb") as f:
    ck = pickle.load(f)
params = jax.tree.map(jnp.asarray, ck["params"])
S = ck["size"]

# the overfit model config (tools/overfit_real_scene.py)
cfg = VicaSplatConfig(
    backbone=VicaNetConfig(
        img_size=S, enc_embed_dim=384, enc_depth=12, enc_num_heads=6,
        dec_embed_dim=384, dec_depth=6, dec_num_heads=6,
    ),
    gaussian_adapter=GaussianAdapterConfig(sh_degree=2),
    gs_center_head_type="linear",
    gs_param_head_type="linear",
    pts3d_bounds=(0.1, 20.0),
)

images = load_images(pathlib.Path("/root/reference/examples") / scene, S)
T = images.shape[0]
f = 0.5 / np.tan(np.radians(60.0) / 2)
K = jnp.asarray(np.array([[f, 0, 0.5], [0, f, 0.5], [0, 0, 1.0]], np.float32))
batch = {"image": jnp.asarray(images)[None] * 2 - 1,
         "intrinsics": jnp.broadcast_to(K, (1, T, 3, 3))}
gt = np.asarray(images)
dec_cfg = DecoderSplattingConfig()
near, far = jnp.full((1, T), 0.05), jnp.full((1, T), 100.0)


def run(p):
    def fwd(batch, p):
        out = vicasplat_forward(p, cfg, batch, dtype=jnp.bfloat16)
        r = decoder_forward(
            dec_cfg, out["gaussians"], out["gaussian_camera_extrins"],
            batch["intrinsics"], near, far, (S, S))
        return r.color

    color = jax.jit(fwd)(batch, p)
    recon = np.clip(np.asarray(color[0]), 0, 1)
    psnr = [float(-10 * np.log10(max(np.mean((recon[i] - gt[i]) ** 2), 1e-10)))
            for i in range(T)]
    t = device_time(fwd, batch, p, iters=20, base=2, repeats=2)
    return psnr, t, recon


psnr_bf16, t_bf16, rec_b = run(params)
q_params, n_q = quantize_tree(params)
print(f"quantized {n_q} linear families", flush=True)
psnr_int8, t_int8, rec_q = run(q_params)

row = {
    "scene": scene,
    "n_quantized_linears": int(n_q),
    "psnr_bf16_per_frame": [round(p, 2) for p in psnr_bf16],
    "psnr_int8_per_frame": [round(p, 2) for p in psnr_int8],
    "psnr_bf16_mean": round(float(np.mean(psnr_bf16)), 3),
    "psnr_int8_mean": round(float(np.mean(psnr_int8)), 3),
    "psnr_delta": round(float(np.mean(psnr_int8) - np.mean(psnr_bf16)), 3),
    "int8_vs_bf16_render_maxdiff": round(
        float(np.abs(rec_q - rec_b).max()), 4),
    "forward_render_ms_bf16": round(t_bf16 * 1e3, 2),
    "forward_render_ms_int8": round(t_int8 * 1e3, 2),
}
print(row, flush=True)
out = pathlib.Path("/root/repo/outputs/int8_trained")
out.mkdir(parents=True, exist_ok=True)
with open(out / "int8_quality.json", "w") as fj:
    json.dump(row, fj, indent=2)
print("wrote outputs/int8_trained/int8_quality.json")
