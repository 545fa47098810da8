"""gs-head tail: does per-frame scheduling fix the merger-add fusion break?

Job 034: v0 (s2d merger + conv1 + conv2, batched over 8 frames) 11.07 ms;
no-merger 7.67; folded-space add won only 0.44. conv1 itself runs at its
~3 ms roofline in context (v0-v4 = 2.73), so the excess is XLA
materializing/laying-out the full-res (8,256,256,256) bf16 activations
around `resize + add` — 268 MB per tensor. These variants change the
SCHEDULE, not the math: per-frame lax.map / unrolled loop shrink live
activations to 33 MB per instance, banded lax.map to ~4 MB.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from benchlib import device_time

from vicasplat_tpu.models.heads import DPTConfig, init_dpt, dpt_trunk
from vicasplat_tpu.models.layers import (
    conv2d, conv2d_s2d, resize_bilinear_align_corners,
)

BT, size, gh = 8, 256, 16
dt = jnp.bfloat16
hook_dims = (1024, 768, 768, 768)
n_gs = 1 + 7 + 3 * 25
gs_cfg = DPTConfig(hook_dims=hook_dims, head_type="gs_params",
                   num_channels=n_gs, use_input_merger=True)

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
gs_p = jax.tree.map(lambda x: x.astype(dt), init_dpt(ks[0], gs_cfg))
hooks = [jax.random.normal(k, (BT, gh * gh, d), dt)
         for k, d in zip(ks[2:6], hook_dims)]
imgs = jax.random.normal(ks[6], (BT, size, size, 3), dt)
stream = {"h": hooks, "im": imgs}


def tm(name, fn, *args, iters=20):
    t = device_time(fn, *args, iters=iters, base=2, repeats=2)
    print(f"{name:40s} {t*1e3:8.3f} ms", flush=True)
    return t


def tail_one(p, p1_half, im):
    """The full-res tail for ONE frame-batch: (n, 128,128,C), (n, 256,256,3)."""
    p1 = resize_bilinear_align_corners(p1_half, (size, size))
    p1 = p1 + jax.nn.relu(conv2d_s2d(p["input_merger"]["conv"], im, 7, s=4,
                                     dtype=dt))
    h = jax.nn.relu(conv2d(p["head"]["conv1"], p1, dtype=dt))
    return conv2d(p["head"]["conv2"], h, dtype=dt)


def head_batched(st, p):
    p1h = dpt_trunk(p, gs_cfg, st["h"], (gh, gh), dt)
    return tail_one(p, p1h, st["im"])


def head_map_frames(st, p):
    p1h = dpt_trunk(p, gs_cfg, st["h"], (gh, gh), dt)
    return jax.lax.map(
        lambda ab: tail_one(p, ab[0][None], ab[1][None])[0],
        (p1h, st["im"]))


def head_unrolled_frames(st, p):
    p1h = dpt_trunk(p, gs_cfg, st["h"], (gh, gh), dt)
    outs = [tail_one(p, p1h[i:i + 1], st["im"][i:i + 1])
            for i in range(BT)]
    return jnp.concatenate(outs, axis=0)


def head_map_pairs(st, p):
    # 2 frames per map step: bigger matmuls, still 1/4 the live footprint
    p1h = dpt_trunk(p, gs_cfg, st["h"], (gh, gh), dt)
    g = BT // 2
    return jax.lax.map(
        lambda ab: tail_one(p, ab[0], ab[1]),
        (p1h.reshape(g, 2, *p1h.shape[1:]),
         st["im"].reshape(g, 2, size, size, 3)),
    ).reshape(BT, size, size, -1)


tm("v0 batched (baseline)", head_batched, stream, gs_p)
tm("v7 lax.map per frame", head_map_frames, stream, gs_p)
tm("v8 unrolled per frame", head_unrolled_frames, stream, gs_p)
tm("v9 lax.map per 2 frames", head_map_pairs, stream, gs_p)
