"""E2E bench workload (8f encode + 12-view render) with encoder flash
on/off. Runs right after job 046 (encoder-stack + flagship-forward sizing):
if flash wins here too, enc_use_flash_attention's default flips and the
driver bench inherits it.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import dataclasses as _dc

import jax
import jax.numpy as jnp
from benchlib import device_time

from vicasplat_tpu.decoder.splatting import (
    DecoderSplattingConfig, decoder_forward,
)
from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig, init_vicasplat,
    vicasplat_forward,
)

B, T, size, n_views = 1, 8, 256, 12
K = jnp.broadcast_to(
    jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
    (B, T, 3, 3))
imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, size, size, 3)) * 2 - 1
tgt_ext = jnp.broadcast_to(jnp.eye(4), (B, n_views, 4, 4))
tgt_ext = tgt_ext.at[:, :, 2, 3].set(jnp.linspace(0.0, 0.5, n_views)[None, :])
tgt_K = jnp.broadcast_to(K[:, :1], (B, n_views, 3, 3))
dec_cfg = DecoderSplattingConfig()

for enc_flash in (False, True):
    cfg = VicaSplatConfig(
        backbone=_dc.replace(VicaNetConfig(),
                             enc_use_flash_attention=enc_flash),
        gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
    params = init_vicasplat(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    def e2e(params_, imgs_):
        out = vicasplat_forward(
            params_, cfg, {"image": imgs_, "intrinsics": K},
            dtype=jnp.bfloat16)
        rendered = decoder_forward(
            dec_cfg, out["gaussians"], tgt_ext, tgt_K,
            jnp.ones((B, n_views)), jnp.full((B, n_views), 100.0),
            (size, size))
        return rendered.color, out["gaussian_camera_extrins"]

    t = device_time(e2e, params, imgs, iters=12, repeats=2)
    print(f"e2e (8f encode + 12v render) enc_flash={enc_flash}: "
          f"{t*1e3:8.2f} ms", flush=True)
