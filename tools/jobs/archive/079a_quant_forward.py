"""Int8 W8A8 serving path at flagship scale: vicasplat_forward bf16 vs
quantized linears (ops/quant.py) on 8 frames @ 256^2.

v5e int8 MXU peak is 2x bf16 (394 vs 197 TOPS); encoder blocks measured
97 TF/s bf16 (jobs 072/076), so the matmul-bound ~26 ms of the 45.9 ms
forward could shrink meaningfully. Also checks output error (correlation
vs bf16) at full scale. Params passed as device_time ARGS (the 072 lesson:
captured param trees balloon the remote compile and get dropped).
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from benchlib import device_time

from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig,
    init_vicasplat, vicasplat_forward,
)
from vicasplat_tpu.ops.quant import cast_tree_preserving_quant, quantize_tree

cfg = VicaSplatConfig(backbone=VicaNetConfig(),
                      gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
B, T, size = 1, 8, 256
params_f32 = init_vicasplat(jax.random.PRNGKey(0), cfg)
params_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params_f32)
params_q, nq = quantize_tree(params_f32)
params_q = cast_tree_preserving_quant(params_q, jnp.bfloat16)
print(f"quantized linears: {nq}", flush=True)

K = jnp.broadcast_to(
    jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
    (B, T, 3, 3))
images = jax.random.uniform(jax.random.PRNGKey(1), (B, T, size, size, 3))
ctx = {"image": images, "intrinsics": K}


def fwd(p, c):
    return vicasplat_forward(p, cfg, c, dtype=jnp.bfloat16)


results = {}
for name, p in (("bf16", params_bf16), ("int8", params_q)):
    t = device_time(fwd, p, ctx, iters=20, base=2, repeats=2)
    results[name + "_ms"] = t * 1e3
    print(f"forward {name}: {t*1e3:.2f} ms", flush=True)

# full-scale output agreement
o_ref = jax.jit(fwd)(params_bf16, ctx)
o_q = jax.jit(fwd)(params_q, ctx)
m_ref = np.asarray(o_ref["gaussians"].means, np.float32).ravel()
m_q = np.asarray(o_q["gaussians"].means, np.float32).ravel()
corr = float(np.corrcoef(m_ref, m_q)[0, 1])
rel = float(np.linalg.norm(m_q - m_ref) / (np.linalg.norm(m_ref) + 1e-9))
results["means_corr"] = corr
results["means_rel_err"] = rel
print(f"means corr {corr:.4f} rel_err {rel:.4f}", flush=True)

out = pathlib.Path("/root/repo/outputs/perf_decomposition/quant_forward.json")
out.parent.mkdir(parents=True, exist_ok=True)
out.write_text(json.dumps(results, indent=1))
print("job 079a_quant_forward.py: ok", flush=True)
