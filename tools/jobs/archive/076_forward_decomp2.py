"""Forward-path decomposition, attempt 2 (see 072_forward_decomp.out).

072 hung the tunnel's remote compile (~27 min, Broken pipe) at the first
enc-scan timing. Root cause isolated against job 070 (which compiled the
full e2e scan in minutes): 072's timed closures CAPTURED the stacked
block params (~600 MB bf16), which jit embeds as HLO constants — the
compile request balloons and the service drops it. 070 passed params as
arguments. Every timed body here takes its params explicitly.
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

# rope tables / masks are tiny; fine as closure constants
cos_e, sin_e = _spatial_rope_tables(cfg, cfg.enc_head_dim, (gh, gw))
cos_s, sin_s = _spatial_rope_tables(cfg, cfg.dec_head_dim, (gh, gw))
cos_t, sin_t = _temporal_rope_tables(cfg, T)
cam_mask = camera_blocked_causal_mask(T, N, False)

enc_blocks = params["enc_blocks"]
eb = jax.tree.map(lambda a: a[0], enc_blocks)
dec_blocks = params["dec_blocks"]
db = jax.tree.map(lambda a: a[0], dec_blocks)
EH, H, C = cfg.enc_num_heads, cfg.dec_num_heads, cfg.dec_embed_dim

res = {}


def tm(name, fn, *args, mult=1):
    try:
        t = device_time(fn, *args, iters=20, repeats=2) * mult
    except Exception as e:
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return
    res[name] = t * 1e3
    print(f"{name:34s} {t*1e3:8.3f} ms", flush=True)


# ---- encoder ----
def enc_scan(h, blocks):
    def step(h, blk):
        return _enc_block_apply(blk, h, cos_e, sin_e, EH, dt), None
    h, _ = jax.lax.scan(step, h, blocks)
    return h

tm("enc scan 24 blocks", enc_scan, x_enc, enc_blocks)

tm("enc x24: ln1+qkv", lambda h, p: linear(
    p["attn"]["qkv"], layernorm(p["norm1"], h), dt), x_enc, eb, mult=24)


def enc_qkv_rope(h, p):
    q, k, v = _split_qkv(linear(p["attn"]["qkv"], layernorm(p["norm1"], h), dt), EH)
    q = rope_lib.apply_rope_2d(q, cos_e[:, None, :], sin_e[:, None, :])
    k = rope_lib.apply_rope_2d(k, cos_e[:, None, :], sin_e[:, None, :])
    return q, k, v

tm("enc x24: +rope", enc_qkv_rope, x_enc, eb, mult=24)
tm("enc x24: +sdpa", lambda h, p: sdpa(*enc_qkv_rope(h, p)), x_enc, eb, mult=24)
tm("enc x24: mlp+ln", lambda h, p: mlp(p["mlp"], layernorm(p["norm2"], h), dt),
   x_enc, eb, mult=24)

# ---- decoder ----
def dec_scan(carry, blocks):
    img, cam = carry
    def step(c, blk):
        i, cc = _dec_block_apply(blk, c[0], c[1], cfg, tables, dt)
        return (i, cc), None
    (img, cam), _ = jax.lax.scan(step, (img, cam), blocks)
    return img, cam

tables = (cos_s, sin_s, cos_t, sin_t, cam_mask)
tm("dec scan 12 blocks", dec_scan, (img, cam), dec_blocks)


def dec_qkv_rope(args, p):
    img, cam = args
    cam_normed = layernorm(p["cam_norm1"], cam)
    img_n = layernorm(p["norm1"], img)
    q_i, k_i, v_i = _split_qkv(linear(p["attn"]["qkv"], img_n, dt), H)
    q_i = rope_lib.apply_rope_2d(q_i, cos_s[:, None, :], sin_s[:, None, :])
    k_i = rope_lib.apply_rope_2d(k_i, cos_s[:, None, :], sin_s[:, None, :])
    q_c, k_c, v_c = _split_qkv(linear(p["attn"]["qkv"], cam_normed, dt), H)
    k_f = jnp.concatenate([k_c[:, :, None], k_i], axis=2).reshape(B, T * (N + 1), H, -1)
    v_f = jnp.concatenate([v_c[:, :, None], v_i], axis=2).reshape(B, T * (N + 1), H, -1)
    return q_i.reshape(B, T * N, H, -1), q_c, k_f, v_f

tm("dec x12: ln+qkv+rope+concat", dec_qkv_rope, (img, cam), db, mult=12)


def dec_joint_attn(args, p):
    q_if, q_c, k_f, v_f = dec_qkv_rope(args, p)
    return _flash_unmasked(q_if, k_f, v_f), sdpa(q_c, k_f, v_f,
                                                 mask=cam_mask[None, None])

tm("dec x12: +joint attn", dec_joint_attn, (img, cam), db, mult=12)


def dec_joint_attn_noflash(args, p):
    q_if, q_c, k_f, v_f = dec_qkv_rope(args, p)
    return sdpa(q_if, k_f, v_f), sdpa(q_c, k_f, v_f, mask=cam_mask[None, None])

tm("dec x12: +joint attn einsum", dec_joint_attn_noflash, (img, cam), db, mult=12)


def dec_cross_neighbor(img, p):
    img_n = layernorm(p["norm2"], img)
    ca = p["cross_attn"]
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

tm("dec x12: cross-neighbor", dec_cross_neighbor, img, db, mult=12)
tm("dec x12: img mlp+ln", lambda i, p: mlp(p["mlp"], layernorm(p["norm3"], i), dt),
   img, db, mult=12)


def dec_modulations(cam, p):
    m1 = _modulation(p["modulation1"], layernorm(p["cam_norm1"], cam), 3, dt)
    m2 = _modulation(p["modulation2"], layernorm(p["cam_norm2"], cam), 6, dt)
    return m1[0], m2[0]

tm("dec x12: modulations", dec_modulations, cam, db, mult=12)

import json, pathlib
out = pathlib.Path("/root/repo/outputs/perf_decomposition")
out.mkdir(parents=True, exist_ok=True)
with open(out / "forward_decomp_r3.json", "w") as f:
    json.dump({k: round(v, 3) for k, v in res.items()}, f, indent=2)
print("wrote", out / "forward_decomp_r3.json")
