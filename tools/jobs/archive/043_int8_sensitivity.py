"""Int8 per-family sensitivity on the trained checkpoint (follow-up to job
033: quantizing all 19 linear families costs -1.96 dB render PSNR).

Quantizes ONE family at a time (quantize_tree include_only) and measures
the render-PSNR delta on the real scene; then re-quantizes everything
EXCEPT the most sensitive families and reports the recovered quality vs
the memory kept in bf16. Output -> outputs/int8_trained/sensitivity.json.
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

from demo import load_images
from vicasplat_tpu.decoder.splatting import (
    DecoderSplattingConfig, decoder_forward,
)
from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig, vicasplat_forward,
)
from vicasplat_tpu.ops.quant import quantizable_paths, quantize_tree

scene = "6c99592614256138"
with open(f"/root/repo/outputs/real_scene_overfit/{scene}_holdout/ckpt.pkl",
          "rb") as f:
    ck = pickle.load(f)
params = jax.tree.map(jnp.asarray, ck["params"])
S = ck["size"]

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
f_ = 0.5 / np.tan(np.radians(60.0) / 2)
K = jnp.asarray(np.array([[f_, 0, 0.5], [0, f_, 0.5], [0, 0, 1.0]],
                         np.float32))
batch = {"image": jnp.asarray(images)[None] * 2 - 1,
         "intrinsics": jnp.broadcast_to(K, (1, T, 3, 3))}
gt = np.asarray(images)
dec_cfg = DecoderSplattingConfig()
near, far = jnp.full((1, T), 0.05), jnp.full((1, T), 100.0)


def mean_psnr(p):
    def fwd(batch, p):
        out = vicasplat_forward(p, cfg, batch, dtype=jnp.bfloat16)
        r = decoder_forward(
            dec_cfg, out["gaussians"], out["gaussian_camera_extrins"],
            batch["intrinsics"], near, far, (S, S))
        return r.color

    color = jax.jit(fwd)(batch, p)
    recon = np.clip(np.asarray(color[0]), 0, 1)
    return float(np.mean(
        [-10 * np.log10(max(np.mean((recon[i] - gt[i]) ** 2), 1e-10))
         for i in range(T)]))


base = mean_psnr(params)
print(f"bf16 mean psnr: {base:.3f}", flush=True)

paths = quantizable_paths(params)
print(f"{len(paths)} quantizable families", flush=True)
rows = []
for path in paths:
    qp, nq = quantize_tree(params, include_only=(path,))
    assert nq >= 1, path
    d = mean_psnr(qp) - base
    rows.append({"path": path, "n": nq, "psnr_delta": round(d, 3)})
    print(f"{path:55s} n={nq} delta={d:+.3f} dB", flush=True)

rows.sort(key=lambda r: r["psnr_delta"])
sensitive = [r["path"] for r in rows if r["psnr_delta"] < -0.15]
print("sensitive families:", sensitive, flush=True)

qp_all, n_all = quantize_tree(params)
all_delta = mean_psnr(qp_all) - base
qp_sel, n_sel = quantize_tree(params, exclude=tuple(sensitive))
sel_delta = mean_psnr(qp_sel) - base


def int8_bytes(p):
    return sum(x.size for x in jax.tree.leaves(p)
               if getattr(x, "dtype", None) == jnp.int8)


out = {
    "scene": scene,
    "bf16_mean_psnr": round(base, 3),
    "per_family": rows,
    "sensitive": sensitive,
    "all_quantized": {"n": int(n_all), "psnr_delta": round(all_delta, 3),
                      "int8_bytes": int(int8_bytes(qp_all))},
    "selective": {"n": int(n_sel), "psnr_delta": round(sel_delta, 3),
                  "int8_bytes": int(int8_bytes(qp_sel))},
}
p = pathlib.Path("/root/repo/outputs/int8_trained/sensitivity.json")
p.parent.mkdir(parents=True, exist_ok=True)
p.write_text(json.dumps(out, indent=2))
print(f"all {n_all} fams: {all_delta:+.3f} dB | selective {n_sel} fams: "
      f"{sel_delta:+.3f} dB", flush=True)
print("wrote", p, flush=True)
