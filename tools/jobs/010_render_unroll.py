"""Round-5 perf probe: unrolled 12-view render loop vs lax.map, and the
e2e impact. Hypothesis (VERDICT r4 #1): lax.map serializes the per-view
pipelines; tracing all 12 views into one flat graph lets XLA overlap
view k+1's projection/sort DMA with view k's composite.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import dataclasses
import json

import jax
import jax.numpy as jnp
from benchlib import device_time, sync

from vicasplat_tpu.decoder.splatting import (
    DecoderSplattingConfig, decoder_forward,
)
from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig,
    init_vicasplat, vicasplat_forward,
)
from vicasplat_tpu.ops.rasterize import RasterizeConfig

cfg = VicaSplatConfig(
    backbone=VicaNetConfig(),
    gaussian_adapter=GaussianAdapterConfig(sh_degree=4),
)
B, T, size, n_views = 1, 8, 256, 12
params = init_vicasplat(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
K = jnp.broadcast_to(
    jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
    (B, T, 3, 3))
batch = {
    "image": jax.random.uniform(
        jax.random.PRNGKey(1), (B, T, size, size, 3)) * 2 - 1,
    "intrinsics": K,
}
tgt_ext = jnp.broadcast_to(jnp.eye(4), (B, n_views, 4, 4))
tgt_ext = tgt_ext.at[:, :, 2, 3].set(jnp.linspace(0.0, 0.5, n_views)[None, :])
tgt_K = jnp.broadcast_to(K[:, :1], (B, n_views, 3, 3))
near = jnp.ones((B, n_views))
far = jnp.full((B, n_views), 100.0)

gaussians = jax.jit(
    lambda p, b: vicasplat_forward(p, cfg, b, dtype=jnp.bfloat16)["gaussians"]
)(params, batch)
sync(gaussians.means[..., :1])

results = {}
for name, unroll in [("map", False), ("unroll", True)]:
    dec_cfg = DecoderSplattingConfig(
        rasterize=RasterizeConfig(unroll_views=unroll))

    def rend(g, dec_cfg=dec_cfg):
        out = decoder_forward(dec_cfg, g, tgt_ext, tgt_K, near, far,
                              (size, size))
        return out.color

    t = device_time(rend, gaussians, iters=20)
    results[f"render12_{name}"] = t * 1e3
    print(f"render 12v [{name}]: {t*1e3:.2f} ms", flush=True)

for name, unroll in [("map", False), ("unroll", True)]:
    dec_cfg = DecoderSplattingConfig(
        rasterize=RasterizeConfig(unroll_views=unroll))

    def e2e(p, b, dec_cfg=dec_cfg):
        out = vicasplat_forward(p, cfg, b, dtype=jnp.bfloat16)
        r = decoder_forward(dec_cfg, out["gaussians"], tgt_ext, tgt_K,
                            near, far, (size, size))
        return r.color, out["gaussian_camera_extrins"]

    t = device_time(e2e, params, batch, iters=14)
    results[f"e2e_{name}"] = t * 1e3
    print(f"e2e [{name}]: {t*1e3:.2f} ms", flush=True)

print("RESULT " + json.dumps(results))
