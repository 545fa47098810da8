"""Block-level timing with einsum sdpa: dec blocks, enc blocks, full model."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from benchlib import device_time

from vicasplat_tpu.models.vicanet import (
    VicaNetConfig, init_vicanet, _dec_block_apply, _enc_block_apply,
    _spatial_rope_tables, _temporal_rope_tables, camera_blocked_causal_mask,
)
from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaSplatConfig, init_vicasplat, vicasplat_forward,
)

bb = VicaNetConfig()
B, T = 1, 8
N = bb.n_tokens
params_bb = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                         init_vicanet(jax.random.PRNGKey(0), bb))

img = jax.random.normal(jax.random.PRNGKey(1), (B, T, N, bb.dec_embed_dim), jnp.bfloat16)
cam = jax.random.normal(jax.random.PRNGKey(2), (B, T, bb.dec_embed_dim), jnp.bfloat16)
cos_s, sin_s = _spatial_rope_tables(bb, bb.dec_head_dim)
cos_t, sin_t = _temporal_rope_tables(bb, T)
cam_mask = camera_blocked_causal_mask(T, N, False)
tables = (cos_s, sin_s, cos_t, sin_t, cam_mask)

def dec_fn(img, cam, blocks):
    def step(carry, blk):
        i, c = carry
        i, c = _dec_block_apply(blk, i, c, bb, tables, jnp.bfloat16)
        return (i, c), None
    (i, c), _ = jax.lax.scan(step, (img, cam), blocks)
    return i, c

t = device_time(dec_fn, img, cam, params_bb["dec_blocks"], iters=20, repeats=2)
print(f"dec 12 blocks [einsum sdpa]: {t*1e3:.2f} ms")

cos_e, sin_e = _spatial_rope_tables(bb, bb.enc_head_dim)
x0 = jax.random.normal(jax.random.PRNGKey(3), (B * T, N, bb.enc_embed_dim), jnp.bfloat16)

def enc_fn(x, blocks):
    def step(h, blk):
        return _enc_block_apply(blk, h, cos_e, sin_e, bb.enc_num_heads, jnp.bfloat16), None
    out, _ = jax.lax.scan(step, x, blocks)
    return out

t = device_time(enc_fn, x0, params_bb["enc_blocks"], iters=20, repeats=2)
print(f"enc 24 blocks [einsum sdpa]: {t*1e3:.2f} ms")

# full model (gs head included: return means+scales so nothing is DCE'd)
cfg = VicaSplatConfig(backbone=bb, gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vicasplat(jax.random.PRNGKey(0), cfg))
K = jnp.broadcast_to(
    jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (B, T, 3, 3))
imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 256, 256, 3)) * 2 - 1

def full(im, p):
    out = vicasplat_forward(p, cfg, {"image": im, "intrinsics": K}, dtype=jnp.bfloat16)
    g = out["gaussians"]
    return g.means, g.scales, g.rotations, g.harmonics, g.opacities, out["gaussian_camera_extrins"]

t = device_time(full, imgs, params, iters=15, repeats=2)
print(f"vicasplat_forward full (no DCE): {t*1e3:.2f} ms")
