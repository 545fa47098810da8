"""Does an optimization_barrier between forward and decoder recover the 8ms?"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from benchlib import device_time

from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig,
    init_vicasplat, vicasplat_forward,
)
from vicasplat_tpu.decoder.splatting import DecoderSplattingConfig, decoder_forward

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
dec_cfg = DecoderSplattingConfig()

def e2e_barrier(im, p):
    out = vicasplat_forward(p, cfg, {"image": im, "intrinsics": K}, dtype=jnp.bfloat16)
    g = jax.lax.optimization_barrier(out["gaussians"])
    r = decoder_forward(dec_cfg, g, tgt_ext, tgt_K,
                        jnp.ones((B, V)), jnp.full((B, V), 100.0), (size, size))
    return r.color, out["gaussian_camera_extrins"]

t = device_time(e2e_barrier, imgs, params, iters=12, base=2, repeats=2)
print(f"e2e with optimization_barrier: {t*1e3:.2f} ms")
