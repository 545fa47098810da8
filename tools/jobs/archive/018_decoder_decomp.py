"""Mix-decoder sub-op decomposition at the flagship shape (B=1, T=8, N=257,
C=768, 12 blocks): where do 12.9 ms go? Times one full dec block, then each
sub-op in isolation (joint attn, cross-neighbor attn, img MLP, qkv/proj
linears, AdaLN/modulation glue) to rank optimization targets.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from benchlib import device_time

from vicasplat_tpu.models.vicanet import (
    VicaNetConfig, _dec_block_init, _dec_block_apply, _spatial_rope_tables,
    _temporal_rope_tables, camera_blocked_causal_mask, _flash_unmasked,
    _neighbor_kv, _modulation,
)
from vicasplat_tpu.models.layers import linear, layernorm, mlp, sdpa

cfg = VicaNetConfig()
B, T, C = 1, 8, cfg.dec_embed_dim
N = cfg.n_tokens  # 257 incl. intrinsic token
H = cfg.dec_num_heads
D = cfg.dec_head_dim
dt = jnp.bfloat16

key = jax.random.PRNGKey(0)
p = _dec_block_init(key, cfg)
img = jax.random.normal(key, (B, T, N, C), dt)
cam = jax.random.normal(key, (B, T, C), dt)

cos_s, sin_s = _spatial_rope_tables(cfg, D, (cfg.grid, cfg.grid))
cos_t, sin_t = _temporal_rope_tables(cfg, T)
cam_mask = camera_blocked_causal_mask(T, N, not cfg.use_intrinsic_embedding)
tables = (cos_s, sin_s, cos_t, sin_t, cam_mask)


def full_block(img, cam):
    return _dec_block_apply(p, img, cam, cfg, tables, dt)

t = device_time(full_block, img, cam, iters=40, repeats=2)
print(f"full dec block        {t*1e3:7.3f} ms  (x12 = {12*t*1e3:.1f})")

# --- sub-ops ---
q = jax.random.normal(key, (B, T * N, H, D), dt)
kf = jax.random.normal(key, (B, T * (N + 1), H, D), dt)
vf = jax.random.normal(key, (B, T * (N + 1), H, D), dt)

t = device_time(_flash_unmasked, q, kf, vf, iters=40, repeats=2)
print(f"joint flash attn      {t*1e3:7.3f} ms")

q_c = jax.random.normal(key, (B, T, H, D), dt)
t = device_time(
    lambda qc, k, v: sdpa(qc, k, v, mask=cam_mask[None, None][:, :, :, :k.shape[1]]),
    q_c, kf[:, : T * (N + 1)], vf[:, : T * (N + 1)], iters=40, repeats=2)
print(f"camera sdpa           {t*1e3:7.3f} ms")

t = device_time(lambda x: linear(p["attn"]["qkv"], x, dt), img,
                iters=40, repeats=2)
print(f"img qkv linear        {t*1e3:7.3f} ms")

a = jax.random.normal(key, (B, T, N, C), dt)
t = device_time(lambda x: linear(p["attn"]["proj"], x, dt), a,
                iters=40, repeats=2)
print(f"img proj linear       {t*1e3:7.3f} ms")

t = device_time(lambda x: mlp(p["mlp"], x, dt), img, iters=40, repeats=2)
print(f"img mlp               {t*1e3:7.3f} ms")

# cross-neighbor attention (proj + neighbor concat + sdpa + proj)
ca = p["cross_attn"]

def cross_neighbor(x):
    qq = linear(ca["projq"], x, dt).reshape(B, T, N, H, D)
    kk = linear(ca["projk"], x, dt).reshape(B, T, N, H, D)
    vv = linear(ca["projv"], x, dt).reshape(B, T, N, H, D)
    k_n, v_n = _neighbor_kv(kk, vv, T)
    nk = k_n.shape[2]
    out = sdpa(qq.reshape(B * T, N, H, D), k_n.reshape(B * T, nk, H, D),
               v_n.reshape(B * T, nk, H, D)).reshape(B, T, N, C)
    return linear(ca["proj"], out, dt)

t = device_time(cross_neighbor, img, iters=40, repeats=2)
print(f"cross-neighbor total  {t*1e3:7.3f} ms")

qq = jax.random.normal(key, (B, T, N, H, D), dt)
kn = jax.random.normal(key, (B, T, 2 * N, H, D), dt)
vn = jax.random.normal(key, (B, T, 2 * N, H, D), dt)

def cn_attn_only(qq, k_n, v_n):
    nk = k_n.shape[2]
    return sdpa(qq.reshape(B * T, N, H, D), k_n.reshape(B * T, nk, H, D),
                v_n.reshape(B * T, nk, H, D))

t = device_time(cn_attn_only, qq, kn, vn, iters=40, repeats=2)
print(f"cross-neighbor sdpa   {t*1e3:7.3f} ms")

# flash variant of the cross-neighbor attention: (B*T) batch, seq N vs 2N
t = device_time(
    lambda a, b, c: _flash_unmasked(
        a.reshape(B * T, N, H, D), b.reshape(B * T, 2 * N, H, D),
        c.reshape(B * T, 2 * N, H, D)),
    qq, kn, vn, iters=40, repeats=2)
print(f"cross-neighbor flash  {t*1e3:7.3f} ms")

# layernorms + modulation glue
def glue(img, cam):
    cn = layernorm(p["cam_norm1"], cam)
    x = layernorm(p["norm1"], img)
    s, sh, g = _modulation(p["modulation1"], cn, 3, dt)
    return x * (1.0 + s) + sh, g

t = device_time(glue, img, cam, iters=40, repeats=2)
print(f"LN + modulation glue  {t*1e3:7.3f} ms")
