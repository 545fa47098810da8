"""Size encoder optimization prizes: bf16 LN, rope cost, fused cross qkv."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from benchlib import device_time

import vicasplat_tpu.models.layers as L
import vicasplat_tpu.models.vicanet as VN
from vicasplat_tpu.models.vicanet import (
    VicaNetConfig, init_vicanet, _spatial_rope_tables, _temporal_rope_tables,
    camera_blocked_causal_mask,
)

bb = VicaNetConfig()
B, T = 1, 8
N = bb.n_tokens
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vicanet(jax.random.PRNGKey(0), bb))
x0 = jax.random.normal(jax.random.PRNGKey(3), (B * T, N, bb.enc_embed_dim), jnp.bfloat16)
img = jax.random.normal(jax.random.PRNGKey(1), (B, T, N, bb.dec_embed_dim), jnp.bfloat16)
cam = jax.random.normal(jax.random.PRNGKey(2), (B, T, bb.dec_embed_dim), jnp.bfloat16)
cos_e, sin_e = _spatial_rope_tables(bb, bb.enc_head_dim)
cos_s, sin_s = _spatial_rope_tables(bb, bb.dec_head_dim)
cos_t, sin_t = _temporal_rope_tables(bb, T)
cam_mask = camera_blocked_causal_mask(T, N, False)
tables = (cos_s, sin_s, cos_t, sin_t, cam_mask)


def enc_fn(x, blocks):
    def step(h, blk):
        return VN._enc_block_apply(blk, h, cos_e, sin_e, bb.enc_num_heads, jnp.bfloat16), None
    out, _ = jax.lax.scan(step, x, blocks)
    return out


def dec_fn(img, cam, blocks):
    def step(carry, blk):
        i, c = carry
        i, c = VN._dec_block_apply(blk, i, c, bb, tables, jnp.bfloat16)
        return (i, c), None
    (i, c), _ = jax.lax.scan(step, (img, cam), blocks)
    return i, c


t = device_time(enc_fn, x0, params["enc_blocks"], iters=20, repeats=2)
print(f"enc baseline: {t*1e3:.2f} ms")
t = device_time(dec_fn, img, cam, params["dec_blocks"], iters=20, repeats=2)
print(f"dec baseline: {t*1e3:.2f} ms")

# (a) bf16 layernorm
orig_ln = L.layernorm
def ln_bf16(p, x, eps=1e-6):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
L.layernorm = ln_bf16
VN.layernorm = ln_bf16
t = device_time(enc_fn, x0, params["enc_blocks"], iters=20, repeats=2)
print(f"enc bf16-LN: {t*1e3:.2f} ms")
t = device_time(dec_fn, img, cam, params["dec_blocks"], iters=20, repeats=2)
print(f"dec bf16-LN: {t*1e3:.2f} ms")
L.layernorm = orig_ln
VN.layernorm = orig_ln

# (b) rope cost: no-op rope
import vicasplat_tpu.ops.rope as RL
orig_2d = RL.apply_rope_2d
RL.apply_rope_2d = lambda x, c, s: x
t = device_time(enc_fn, x0, params["enc_blocks"], iters=20, repeats=2)
print(f"enc no-rope: {t*1e3:.2f} ms")
t = device_time(dec_fn, img, cam, params["dec_blocks"], iters=20, repeats=2)
print(f"dec no-rope: {t*1e3:.2f} ms")
RL.apply_rope_2d = orig_2d

# (c) rope in bf16 (tables cast, no f32 round trip)
def rope2d_bf16(x, c, s):
    cb = c.astype(x.dtype)
    sb = s.astype(x.dtype)
    h = x.shape[-1] // 2
    y, xh = x[..., :h], x[..., h:]
    q = h // 2
    rot = jnp.concatenate([-y[..., q:], y[..., :q], -xh[..., q:], xh[..., :q]], axis=-1)
    return x * cb + rot * sb
RL.apply_rope_2d = rope2d_bf16
t = device_time(enc_fn, x0, params["enc_blocks"], iters=20, repeats=2)
print(f"enc bf16-rope: {t*1e3:.2f} ms")
t = device_time(dec_fn, img, cam, params["dec_blocks"], iters=20, repeats=2)
print(f"dec bf16-rope: {t*1e3:.2f} ms")
RL.apply_rope_2d = orig_2d

# (a)+(c) combined
L.layernorm = ln_bf16
VN.layernorm = ln_bf16
RL.apply_rope_2d = rope2d_bf16
t = device_time(enc_fn, x0, params["enc_blocks"], iters=20, repeats=2)
print(f"enc bf16 LN+rope: {t*1e3:.2f} ms")
t = device_time(dec_fn, img, cam, params["dec_blocks"], iters=20, repeats=2)
print(f"dec bf16 LN+rope: {t*1e3:.2f} ms")
