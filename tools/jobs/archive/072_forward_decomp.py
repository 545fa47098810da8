"""Forward-path decomposition: where do encoder (12.9 ms) and mix decoder
(12.9 ms) spend time vs their matmul rooflines (~6.2 / ~3.3 ms)?

Times the enc/dec scans and then each sub-component of one block (x24 / x12)
at flagship shapes: enc (8, 257, 1024) 16 heads; dec (1, 8, 257, 768) 12
heads, joint attention over 2056+8 tokens.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from benchlib import device_time, sync

from vicasplat_tpu.models.vicanet import (
    VicaNetConfig, init_vicanet, _enc_block_apply, _dec_block_apply,
    _split_qkv, _neighbor_kv, _modulation, _flash_unmasked,
    _spatial_rope_tables, _temporal_rope_tables, camera_blocked_causal_mask,
)
from vicasplat_tpu.models import layers
from vicasplat_tpu.models.layers import linear, layernorm, mlp, sdpa
from vicasplat_tpu.ops import rope as rope_lib

cfg = VicaNetConfig()
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vicanet(jax.random.PRNGKey(0), cfg))
B, T = 1, 8
gh = gw = 256 // cfg.patch_size
N = gh * gw + 1
dt = jnp.bfloat16

key = jax.random.PRNGKey(1)
x_enc = jax.random.normal(key, (B * T, N, cfg.enc_embed_dim), dt)
img = jax.random.normal(key, (B, T, N, cfg.dec_embed_dim), dt)
cam = jax.random.normal(key, (B, T, cfg.dec_embed_dim), dt)

cos_e, sin_e = _spatial_rope_tables(cfg, cfg.enc_head_dim, (gh, gw))
cos_s, sin_s = _spatial_rope_tables(cfg, cfg.dec_head_dim, (gh, gw))
cos_t, sin_t = _temporal_rope_tables(cfg, T)
cam_mask = camera_blocked_causal_mask(T, N, False)
tables = (cos_s, sin_s, cos_t, sin_t, cam_mask)

res = {}


def tm(name, fn, *args, mult=1):
    t = device_time(fn, *args, iters=20, repeats=2) * mult
    res[name] = t * 1e3
    print(f"{name:34s} {t*1e3:8.3f} ms")


# ---- encoder ----
def enc_scan(h):
    def step(h, blk):
        return _enc_block_apply(blk, h, cos_e, sin_e, cfg.enc_num_heads, dt), None
    h, _ = jax.lax.scan(step, h, params["enc_blocks"])
    return h

tm("enc scan 24 blocks", enc_scan, x_enc)

eb = jax.tree.map(lambda a: a[0], params["enc_blocks"])
EH = cfg.enc_num_heads

tm("enc x24: ln1+qkv", lambda h: linear(
    eb["attn"]["qkv"], layernorm(eb["norm1"], h), dt), x_enc, mult=24)


def enc_qkv_rope(h):
    q, k, v = _split_qkv(linear(eb["attn"]["qkv"], layernorm(eb["norm1"], h), dt), EH)
    q = rope_lib.apply_rope_2d(q, cos_e[:, None, :], sin_e[:, None, :])
    k = rope_lib.apply_rope_2d(k, cos_e[:, None, :], sin_e[:, None, :])
    return q, k, v

tm("enc x24: +rope", enc_qkv_rope, x_enc, mult=24)


def enc_attn(h):
    q, k, v = enc_qkv_rope(h)
    return sdpa(q, k, v)

tm("enc x24: +sdpa", enc_attn, x_enc, mult=24)
tm("enc x24: mlp+ln", lambda h: mlp(eb["mlp"], layernorm(eb["norm2"], h), dt),
   x_enc, mult=24)

# ---- decoder ----
def dec_scan(args):
    img, cam = args
    def step(carry, blk):
        i, c = carry
        i, c = _dec_block_apply(blk, i, c, cfg, tables, dt)
        return (i, c), None
    (img, cam), _ = jax.lax.scan(step, (img, cam), params["dec_blocks"])
    return img, cam

tm("dec scan 12 blocks", dec_scan, (img, cam))

db = jax.tree.map(lambda a: a[0], params["dec_blocks"])
H = cfg.dec_num_heads
C = cfg.dec_embed_dim


def dec_qkv_rope(args):
    img, cam = args
    cam_normed = layernorm(db["cam_norm1"], cam)
    img_n = layernorm(db["norm1"], img)
    q_i, k_i, v_i = _split_qkv(linear(db["attn"]["qkv"], img_n, dt), H)
    q_i = rope_lib.apply_rope_2d(q_i, cos_s[:, None, :], sin_s[:, None, :])
    k_i = rope_lib.apply_rope_2d(k_i, cos_s[:, None, :], sin_s[:, None, :])
    q_c, k_c, v_c = _split_qkv(linear(db["attn"]["qkv"], cam_normed, dt), H)
    k_f = jnp.concatenate([k_c[:, :, None], k_i], axis=2).reshape(B, T * (N + 1), H, -1)
    v_f = jnp.concatenate([v_c[:, :, None], v_i], axis=2).reshape(B, T * (N + 1), H, -1)
    return q_i.reshape(B, T * N, H, -1), q_c, k_f, v_f

tm("dec x12: ln+qkv+rope+concat", dec_qkv_rope, (img, cam), mult=12)


def dec_joint_attn(args):
    q_if, q_c, k_f, v_f = dec_qkv_rope(args)
    img_a = _flash_unmasked(q_if, k_f, v_f)
    cam_a = sdpa(q_c, k_f, v_f, mask=cam_mask[None, None])
    return img_a, cam_a

tm("dec x12: +joint attn", dec_joint_attn, (img, cam), mult=12)


def dec_joint_attn_noflash(args):
    q_if, q_c, k_f, v_f = dec_qkv_rope(args)
    img_a = sdpa(q_if, k_f, v_f)
    cam_a = sdpa(q_c, k_f, v_f, mask=cam_mask[None, None])
    return img_a, cam_a

tm("dec x12: +joint attn einsum", dec_joint_attn_noflash, (img, cam), mult=12)


def dec_cross_neighbor(img):
    img_n = layernorm(db["norm2"], img)
    ca = db["cross_attn"]
    q = linear(ca["projq"], img_n, dt).reshape(B, T, N, H, -1)
    k = linear(ca["projk"], img_n, dt).reshape(B, T, N, H, -1)
    v = linear(ca["projv"], img_n, dt).reshape(B, T, N, H, -1)
    q = rope_lib.apply_rope_2d(q, cos_s[:, None, :], sin_s[:, None, :])
    k = rope_lib.apply_rope_2d(k, cos_s[:, None, :], sin_s[:, None, :])
    k_n, v_n = _neighbor_kv(k, v, T)
    nk = k_n.shape[2]
    out = sdpa(q.reshape(B * T, N, H, -1), k_n.reshape(B * T, nk, H, -1),
               v_n.reshape(B * T, nk, H, -1)).reshape(B, T, N, C)
    return linear(ca["proj"], out, dt)

tm("dec x12: cross-neighbor", dec_cross_neighbor, img, mult=12)

tm("dec x12: img mlp+ln", lambda i: mlp(db["mlp"], layernorm(db["norm3"], i), dt),
   img, mult=12)


def dec_modulations(cam):
    cam_normed = layernorm(db["cam_norm1"], cam)
    m1 = _modulation(db["modulation1"], cam_normed, 3, dt)
    m2 = _modulation(db["modulation2"], layernorm(db["cam_norm2"], cam), 6, dt)
    return m1[0], m2[0]

tm("dec x12: modulations", dec_modulations, cam, mult=12)

import json, pathlib
out = pathlib.Path("/root/repo/outputs/perf_decomposition")
out.mkdir(parents=True, exist_ok=True)
with open(out / "forward_decomp_r3.json", "w") as f:
    json.dump({k: round(v, 3) for k, v in res.items()}, f, indent=2)
print("wrote", out / "forward_decomp_r3.json")
