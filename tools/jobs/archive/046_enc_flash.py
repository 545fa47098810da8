"""Encoder flash attention: does killing the logits HBM round-trip pay?

The encoder runs einsum sdpa: per block the f32 logits (8, 16, 257, 257)
= 34 MB materialize for the softmax (plus the bf16 probs for PV), ~24 x
~0.1 ms of pure HBM traffic across the stack — the suspected gap between
the encoder's measured 97 TF/s and the ~200 TF/s of its constituent
matmuls. Flash pads 257 -> 512 (segment-masked dummies): 4x the attention
-core MXU work, but that core is trivial (2.2 -> 8.6 GF/block vs the
block's 54 GF of linears). Decoder precedent: flash at 512 blocks beat
einsum 14.0 -> 12.9 ms (jobs 027-030).

Measures: (a) 24-block encoder scan einsum vs flash + numerics,
(b) flagship forward with enc_use_flash_attention on/off.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import dataclasses as _dc

import jax
import jax.numpy as jnp
import numpy as np
from benchlib import device_time

from vicasplat_tpu.models.vicanet import (
    VicaNetConfig, init_vicanet, _enc_block_apply, _spatial_rope_tables,
)

bb = VicaNetConfig()
B, T = 1, 8
N = bb.n_tokens
dt = jnp.bfloat16
params = jax.tree.map(lambda x: x.astype(dt),
                      init_vicanet(jax.random.PRNGKey(0), bb))
x0 = jax.random.normal(jax.random.PRNGKey(3), (B * T, N, bb.enc_embed_dim), dt)
cos_e, sin_e = _spatial_rope_tables(bb, bb.enc_head_dim, (bb.grid, bb.grid))


def enc_fn(flash):
    def f(x, blocks):
        def step(h, blk):
            return _enc_block_apply(blk, h, cos_e, sin_e, bb.enc_num_heads,
                                    dt, flash=flash), None
        out, _ = jax.lax.scan(step, x, blocks)
        return out
    return f


# numerics: one block, einsum vs flash
blk0 = jax.tree.map(lambda x: x[0], params["enc_blocks"])
a = _enc_block_apply(blk0, x0, cos_e, sin_e, bb.enc_num_heads, dt, flash=False)
b = _enc_block_apply(blk0, x0, cos_e, sin_e, bb.enc_num_heads, dt, flash=True)
d = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
s = float(jnp.abs(a.astype(jnp.float32)).max())
print(f"one-block maxdiff {d:.6f} (scale {s:.3f})", flush=True)

t_e = device_time(enc_fn(False), x0, params["enc_blocks"], iters=20, repeats=2)
print(f"enc 24 blocks, einsum sdpa   {t_e*1e3:8.3f} ms", flush=True)
t_f = device_time(enc_fn(True), x0, params["enc_blocks"], iters=20, repeats=2)
print(f"enc 24 blocks, flash         {t_f*1e3:8.3f} ms", flush=True)

# flagship forward on/off
from vicasplat_tpu.models import VicaSplatConfig, GaussianAdapterConfig
from vicasplat_tpu.models import init_vicasplat
from vicasplat_tpu.models.vicasplat import vicasplat_forward

for enc_flash in (False, True):
    cfg = VicaSplatConfig(
        backbone=_dc.replace(VicaNetConfig(), enc_use_flash_attention=enc_flash),
        gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
    p = init_vicasplat(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, p)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 256, 256, 3), dt)
    K = jnp.broadcast_to(
        jnp.array([[256.0, 0, 128], [0, 256.0, 128], [0, 0, 1]], dt),
        (1, 8, 3, 3))

    def fwd(p_, imgs_, K_):
        return vicasplat_forward(p_, cfg, {"image": imgs_, "intrinsics": K_},
                                 dtype=dt)

    t = device_time(fwd, p, imgs, K, iters=20, repeats=2)
    print(f"flagship forward enc_flash={enc_flash}: {t*1e3:8.3f} ms",
          flush=True)
