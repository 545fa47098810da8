"""Encoder decomposition: backbone vs heads vs adapter, bf16-resident."""
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
from vicasplat_tpu.models.vicanet import vicanet_forward
from vicasplat_tpu.models.heads import (
    DPTConfig, dpt_regression_head, dpt_gs_head,
)
from vicasplat_tpu.models.adapter import adapt_gaussians

cfg = VicaSplatConfig(
    backbone=VicaNetConfig(),
    gaussian_adapter=GaussianAdapterConfig(sh_degree=4),
)
bb = cfg.backbone
B, T, size = 1, 8, 256
params = init_vicasplat(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
K = jnp.broadcast_to(
    jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (B, T, 3, 3))
imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, size, size, 3)) * 2 - 1
batch = {"image": imgs, "intrinsics": K}

t = device_time(
    lambda p, b: vicasplat_forward(p, cfg, b, dtype=jnp.bfloat16)["gaussians"].means,
    params, batch, iters=20)
print(f"vicasplat_forward full: {t*1e3:.2f} ms")

t = device_time(
    lambda p, im: vicanet_forward(p, bb, im, K, dtype=jnp.bfloat16)[0],
    params["backbone"], imgs, iters=20)
print(f"vicanet backbone: {t*1e3:.2f} ms")

# hooks for the heads
interms = jax.jit(
    lambda p, im: vicanet_forward(p, bb, im, K, dtype=jnp.bfloat16)[3]
)(params["backbone"], imgs)
hooks = cfg.dpt_hooks()
hook_tokens = [
    interms[h].reshape(B * T, bb.n_patches, interms[h].shape[-1]) for h in hooks
]
sync(hook_tokens[0][..., :2])

center_cfg = DPTConfig(
    hook_dims=(bb.enc_embed_dim,) + (bb.dec_embed_dim,) * 3,
    num_channels=3, head_type="regression", patch_size=bb.patch_size)
gs_cfg = DPTConfig(
    hook_dims=(bb.enc_embed_dim,) + (bb.dec_embed_dim,) * 3,
    num_channels=cfg.gaussian_adapter.raw_gs_dim, head_type="gs_params",
    patch_size=bb.patch_size, use_input_merger=True)
grid_hw = (bb.grid, bb.grid)
imgs_flat = imgs.reshape(B * T, size, size, 3)

t = device_time(
    lambda p, h0, h1, h2, h3: dpt_regression_head(
        p, center_cfg, [h0, h1, h2, h3], grid_hw, jnp.bfloat16),
    params["center_head"], *hook_tokens, iters=20)
print(f"dpt center head: {t*1e3:.2f} ms")

t = device_time(
    lambda p, h0, h1, h2, h3: dpt_gs_head(
        p, gs_cfg, [h0, h1, h2, h3], grid_hw, imgs_flat, jnp.bfloat16),
    params["gaussian_param_head"], *hook_tokens, iters=20)
print(f"dpt gs head: {t*1e3:.2f} ms")

raw = jax.random.normal(jax.random.PRNGKey(2), (B, T, size, size, 3 + cfg.gaussian_adapter.raw_gs_dim))
t = device_time(lambda r: adapt_gaussians(r, cfg.gaussian_adapter, None).means,
                raw, iters=20)
print(f"adapter: {t*1e3:.2f} ms")
