"""decoder_forward glue cost: full decoder vs bare render on same gaussians."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from benchlib import device_time, sync

from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig,
    init_vicasplat, vicasplat_forward,
)
from vicasplat_tpu.decoder.splatting import DecoderSplattingConfig, decoder_forward
from vicasplat_tpu.ops.rasterize.render import render, RasterizeConfig

cfg = VicaSplatConfig(backbone=VicaNetConfig(),
                      gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
B, T, size, V = 1, 8, 256, 12
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vicasplat(jax.random.PRNGKey(0), cfg))
K = jnp.broadcast_to(
    jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (B, T, 3, 3))
imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, size, size, 3)) * 2 - 1
out = jax.jit(lambda p, b: vicasplat_forward(p, cfg, b, dtype=jnp.bfloat16))(
    params, {"image": imgs, "intrinsics": K})
g = out["gaussians"]
sync(g.means[..., :1])

tgt_ext = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
tgt_ext = tgt_ext.at[:, :, 2, 3].set(jnp.linspace(0.0, 0.5, V)[None])
tgt_K = jnp.broadcast_to(K[:, :1], (B, V, 3, 3))
dec_cfg = DecoderSplattingConfig()

t = device_time(
    lambda e: decoder_forward(dec_cfg, g, e, tgt_K, jnp.ones((B, V)),
                              jnp.full((B, V), 100.0), (size, size)).color,
    tgt_ext, iters=8, base=2, repeats=2)
print(f"decoder_forward 12v: {t*1e3:.1f} ms")

from vicasplat_tpu.decoder.splatting import flatten_gaussians
gf = flatten_gaussians(g)
sync(gf.means[..., :1])
t = device_time(
    lambda e: render(gf.means[0], gf.covariances[0], gf.harmonics[0],
                     gf.opacities[0], e, tgt_K[0], (size, size),
                     jnp.zeros(3), 4, cfg=RasterizeConfig())[0],
    tgt_ext[0], iters=8, base=2, repeats=2)
print(f"bare render 12v: {t*1e3:.1f} ms")

# harmonics dtype sensitivity: f32 vs bf16 tables into the same render
gf16 = gf._replace(harmonics=gf.harmonics.astype(jnp.bfloat16))
t = device_time(
    lambda e: render(gf16.means[0], gf16.covariances[0],
                     gf16.harmonics[0].astype(jnp.float32),
                     gf16.opacities[0], e, tgt_K[0], (size, size),
                     jnp.zeros(3), 4, cfg=RasterizeConfig())[0],
    tgt_ext[0], iters=8, base=2, repeats=2)
print(f"bare render 12v (bf16-stored SH): {t*1e3:.1f} ms")
