"""E2E check of the SoA pallas composite as production backend (round 3).

Measures the 12-view render and full e2e (8f 256^2 forward + 12-view
render) with backend="xla" vs "pallas" (the new auto default on
accelerators), plus numeric agreement on the rendered images.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib", "bench")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from benchlib import device_time, sync

from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig,
    init_vicasplat, vicasplat_forward,
)
from vicasplat_tpu.decoder.splatting import DecoderSplattingConfig, decoder_forward
from vicasplat_tpu.ops.rasterize import RasterizeConfig

cfg = VicaSplatConfig(backbone=VicaNetConfig(),
                      gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
B, T, size, V = 1, 8, 256, 12
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vicasplat(jax.random.PRNGKey(0), cfg))
K = jnp.broadcast_to(
    jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (B, T, 3, 3))
imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, size, size, 3)) * 2 - 1
tgt_ext = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
tgt_ext = tgt_ext.at[:, :, 2, 3].set(jnp.linspace(0.0, 0.5, V)[None])
tgt_K = jnp.broadcast_to(K[:, :1], (B, V, 3, 3))

fwd = jax.jit(lambda im, p: vicasplat_forward(
    p, cfg, {"image": im, "intrinsics": K}, dtype=jnp.bfloat16))
out = fwd(imgs, params)
g = out["gaussians"]
sync(g.means[0, 0, 0])

for backend in ("xla", "pallas"):
    dcfg = DecoderSplattingConfig(
        rasterize=RasterizeConfig(backend=backend))

    def rv(gm):
        gg = g._replace(means=gm)
        return decoder_forward(dcfg, gg, tgt_ext, tgt_K,
                               jnp.ones((B, V)), jnp.full((B, V), 100.0),
                               (size, size)).color

    t = device_time(rv, g.means, iters=10, base=2, repeats=2)
    print(f"render 12v [{backend:6s}]: {t*1e3:7.2f} ms", flush=True)

# numeric agreement
col_x = jax.jit(lambda gm: decoder_forward(
    DecoderSplattingConfig(rasterize=RasterizeConfig(backend="xla")),
    g._replace(means=gm), tgt_ext, tgt_K, jnp.ones((B, V)),
    jnp.full((B, V), 100.0), (size, size)).color)(g.means)
col_p = jax.jit(lambda gm: decoder_forward(
    DecoderSplattingConfig(rasterize=RasterizeConfig(backend="pallas")),
    g._replace(means=gm), tgt_ext, tgt_K, jnp.ones((B, V)),
    jnp.full((B, V), 100.0), (size, size)).color)(g.means)
d = float(jnp.abs(col_x - col_p).max())
print("max |color diff| xla vs pallas:", d, flush=True)
assert d < 1e-5, d

# e2e number via bench.py (auto backend -> pallas on this chip); its scan
# compile is protected by the dispatch fallback
import bench
bench.main()
