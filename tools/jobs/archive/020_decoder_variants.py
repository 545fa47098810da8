"""Mix-decoder cost attribution: which piece of the 15.5ms is slow."""
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
    _temporal_rope_tables, camera_blocked_causal_mask, _enc_block_apply,
)

bb = VicaNetConfig()
B, T = 1, 8
N = bb.n_tokens
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vicanet(jax.random.PRNGKey(0), bb))

img = jax.random.normal(jax.random.PRNGKey(1), (B, T, N, bb.dec_embed_dim), jnp.bfloat16)
cam = jax.random.normal(jax.random.PRNGKey(2), (B, T, bb.dec_embed_dim), jnp.bfloat16)

def dec_scan(cfgv):
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
    return fn

t = device_time(dec_scan(bb), img, cam, params["dec_blocks"], iters=20)
print(f"dec 12 blocks (full): {t*1e3:.2f} ms")

v = dataclasses.replace(bb, use_cross_neighbor_attention=False)
# param subset still has cross_attn keys; _dec_block_apply ignores them
t = device_time(dec_scan(v), img, cam, params["dec_blocks"], iters=20)
print(f"dec 12 blocks (no cross-neighbor): {t*1e3:.2f} ms")

v2 = dataclasses.replace(bb, use_framewise_modulation=False,
                         use_cross_neighbor_attention=True)
try:
    t = device_time(dec_scan(v2), img, cam, params["dec_blocks"], iters=20)
    print(f"dec 12 blocks (no modulation): {t*1e3:.2f} ms")
except Exception as e:
    print("no-modulation variant failed:", type(e).__name__)

v3 = dataclasses.replace(bb, use_blocked_causal_attention=False)
t = device_time(dec_scan(v3), img, cam, params["dec_blocks"], iters=20)
print(f"dec 12 blocks (no cam mask): {t*1e3:.2f} ms")

# enc: scan vs unrolled
cos_e, sin_e = _spatial_rope_tables(bb, bb.enc_head_dim)
x0 = jax.random.normal(jax.random.PRNGKey(3), (B * T, N, bb.enc_embed_dim), jnp.bfloat16)

def enc_scan(x, blocks):
    def step(h, blk):
        return _enc_block_apply(blk, h, cos_e, sin_e, bb.enc_num_heads, jnp.bfloat16), None
    out, _ = jax.lax.scan(step, x, blocks)
    return out

def enc_unrolled(x, blocks):
    for i in range(bb.enc_depth):
        blk = jax.tree.map(lambda a: a[i], blocks)
        x = _enc_block_apply(blk, x, cos_e, sin_e, bb.enc_num_heads, jnp.bfloat16)
    return x

t = device_time(enc_scan, x0, params["enc_blocks"], iters=20)
print(f"enc 24 blocks scan: {t*1e3:.2f} ms")
t = device_time(enc_unrolled, x0, params["enc_blocks"], iters=20)
print(f"enc 24 blocks unrolled: {t*1e3:.2f} ms")

# attention primitives
import math
q = jax.random.normal(jax.random.PRNGKey(4), (B * T, N, 16, 64), jnp.bfloat16)
t = device_time(lambda q: jax.nn.dot_product_attention(q, q, q), q, iters=30)
print(f"sdpa enc (8,257,16,64): {t*1e3:.3f} ms")

def attn_einsum(q):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, q) / math.sqrt(64)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, q)

t = device_time(attn_einsum, q, iters=30)
print(f"einsum attn enc: {t*1e3:.3f} ms")

qd = jax.random.normal(jax.random.PRNGKey(5), (B, T * N, 12, 64), jnp.bfloat16)
t = device_time(lambda q: jax.nn.dot_product_attention(q, q, q), qd, iters=30)
print(f"sdpa dec joint (1,2056,12,64): {t*1e3:.3f} ms")
t = device_time(attn_einsum, qd, iters=30)
print(f"einsum attn dec joint: {t*1e3:.3f} ms")

# dec matmul floor: the 16d^2-per-token matmuls alone
wqkv = jax.random.normal(jax.random.PRNGKey(6), (768, 2304), jnp.bfloat16)
wmlp1 = jax.random.normal(jax.random.PRNGKey(7), (768, 3072), jnp.bfloat16)
wmlp2 = jax.random.normal(jax.random.PRNGKey(8), (3072, 768), jnp.bfloat16)
xt = jax.random.normal(jax.random.PRNGKey(9), (T * N, 768), jnp.bfloat16)

def dec_mm(x):
    for _ in range(12):
        x = jax.nn.gelu((x @ wqkv)[:, :768])
        x = (jax.nn.gelu(x @ wmlp1) @ wmlp2)
    return x

t = device_time(dec_mm, xt, iters=20)
fl = 12 * 2 * (768 * 2304 + 768 * 3072 + 3072 * 768) * xt.shape[0]
print(f"dec matmul skeleton: {t*1e3:.2f} ms ({fl/t/1e12:.0f} TFLOP/s)")
