"""Decoder with flash joint attention: speed + numerics vs einsum path."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import dataclasses
import jax
import jax.numpy as jnp
from benchlib import device_time, sync

from vicasplat_tpu.models.vicanet import (
    VicaNetConfig, init_vicanet, _dec_block_apply, _spatial_rope_tables,
    _temporal_rope_tables, camera_blocked_causal_mask,
)

B, T = 1, 8

def run(tag, cfgv):
    N = cfgv.n_tokens
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_vicanet(jax.random.PRNGKey(0), cfgv))
    img = jax.random.normal(jax.random.PRNGKey(1), (B, T, N, cfgv.dec_embed_dim), jnp.bfloat16)
    cam = jax.random.normal(jax.random.PRNGKey(2), (B, T, cfgv.dec_embed_dim), jnp.bfloat16)
    cos_s, sin_s = _spatial_rope_tables(cfgv, cfgv.dec_head_dim)
    cos_t, sin_t = _temporal_rope_tables(cfgv, T)
    cam_mask = camera_blocked_causal_mask(T, N, False)
    tables = (cos_s, sin_s, cos_t, sin_t, cam_mask)

    def fn(img, cam, blocks):
        def step(carry, blk):
            i, c = carry
            i, c = _dec_block_apply(blk, i, c, cfgv, tables, jnp.bfloat16)
            return (i, c), None
        (i, c), _ = jax.lax.scan(step, (img, cam), blocks)
        return i, c

    t = device_time(fn, img, cam, params["dec_blocks"], iters=20, repeats=2)
    print(f"dec 12 blocks [{tag}]: {t*1e3:.2f} ms")
    return jax.jit(fn)(img, cam, params["dec_blocks"])

bb = VicaNetConfig()
o_f = run("flash", bb)
o_e = run("einsum", dataclasses.replace(bb, use_flash_attention=False))
d_img = float(jnp.abs(o_f[0].astype(jnp.float32) - o_e[0].astype(jnp.float32)).max())
d_cam = float(jnp.abs(o_f[1].astype(jnp.float32) - o_e[1].astype(jnp.float32)).max())
print(f"flash-vs-einsum max|d| img {d_img:.2e} cam {d_cam:.2e}")

# backward step check (remat + flash custom vjp)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vicanet(jax.random.PRNGKey(0), bb))
from vicasplat_tpu.models.vicanet import vicanet_forward
imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 256, 256, 3), jnp.float32) * 2 - 1
K = jnp.broadcast_to(jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (B, T, 3, 3))

def loss(p):
    x, cam_e, _, _ = vicanet_forward(p, bb, imgs, K, dtype=jnp.bfloat16, remat=True)
    return jnp.sum(jnp.abs(x.astype(jnp.float32))) + jnp.sum(jnp.abs(cam_e.astype(jnp.float32)))

g = jax.jit(jax.grad(loss))(params)
leaves = jax.tree.leaves(g)
finite = all(bool(jnp.isfinite(l).all()) for l in leaves)
print(f"backbone grad finite with flash+remat: {finite}")
