"""Localize the gs-head merger fusion break (follow-up to job 023).

Job 023 (params as jit args — the production condition): full gs head
13.17 ms, no-merger variant 7.72 ms. The merger's isolated work is ~1 ms
(s2d conv 0.4-1.0 + 134 MB add ~0.4), so ~4.5 ms is a fusion/layout break
around `p1_up + relu(merger(img))` feeding conv1. Variants isolate whether
the break is (a) the s2d depth-to-space layout, (b) conv1's input no longer
fusing with the resize einsums, or (c) the add itself.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from benchlib import device_time

from vicasplat_tpu.models.heads import DPTConfig, init_dpt, dpt_trunk, dpt_gs_head
from vicasplat_tpu.models.layers import (
    conv2d, conv2d_im2col, conv2d_s2d, resize_bilinear_align_corners,
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
    print(f"{name:36s} {t*1e3:8.3f} ms", flush=True)
    return t


def head_with(merger_fn, conv1_fn):
    def f(st, p):
        p1 = dpt_trunk(p, gs_cfg, st["h"], (gh, gh), dt)
        n, hh, ww, c = p1.shape
        p1 = resize_bilinear_align_corners(p1, (size, size))
        if merger_fn is not None:
            p1 = p1 + merger_fn(p, st["im"])
        h = conv1_fn(p, p1)
        return conv2d(p["head"]["conv2"], h, dtype=dt)

    return f


def merger_s2d(p, im):
    return jax.nn.relu(
        conv2d_s2d(p["input_merger"]["conv"], im.astype(dt), 7, s=4, dtype=dt))


def merger_plain(p, im):
    return jax.nn.relu(
        conv2d(p["input_merger"]["conv"], im.astype(dt), dtype=dt))


def conv1_std(p, x):
    return jax.nn.relu(conv2d(p["head"]["conv1"], x, dtype=dt))


def conv1_im2col(p, x):
    return jax.nn.relu(conv2d_im2col(p["head"]["conv1"], x, 3, dtype=dt))


def conv1_1x1(p, x):
    # 1x1 stand-in (center tap only): NOT equivalent — cost localization only
    w1 = {"w": p["head"]["conv1"]["w"][1:2, 1:2]}
    return jax.nn.relu(conv2d(w1, x, dtype=dt))


tm("v0 baseline (s2d merger)", head_with(merger_s2d, conv1_std), stream, gs_p)
tm("v1 no merger", head_with(None, conv1_std), stream, gs_p)
tm("v2 plain-conv merger", head_with(merger_plain, conv1_std), stream, gs_p)
tm("v3 s2d merger + im2col conv1",
   head_with(merger_s2d, conv1_im2col), stream, gs_p)
tm("v4 s2d merger + 1x1 conv1 (localize)",
   head_with(merger_s2d, conv1_1x1), stream, gs_p)
tm("v5 no merger + 1x1 conv1 (localize)",
   head_with(None, conv1_1x1), stream, gs_p)


# v6: merger add in FOLDED (s2d) space — depth-to-space is deferred and
# fused into the add: s2d(p1_up) + relu(conv_folded(img)), then one d2s.
# Exactly equivalent (d2s is a bijective reshuffle; relu commutes with it).
def head_folded_add(st, p):
    from vicasplat_tpu.models.layers import conv2d_s2d_folded

    p1 = dpt_trunk(p, gs_cfg, st["h"], (gh, gh), dt)
    p1 = resize_bilinear_align_corners(p1, (size, size))
    n, H, W, C = p1.shape
    s = 4
    # fold p1 into block space: (n, H/s, W/s, s, s, C)
    p1f = p1.reshape(n, H // s, s, W // s, s, C).transpose(0, 1, 3, 2, 4, 5)
    yf = conv2d_s2d_folded(p["input_merger"]["conv"], st["im"].astype(dt), 7,
                           s=s, dtype=dt)
    xf = p1f + jax.nn.relu(yf)
    x = xf.transpose(0, 1, 3, 2, 4, 5).reshape(n, H, W, C)
    h = jax.nn.relu(conv2d(p["head"]["conv1"], x, dtype=dt))
    return conv2d(p["head"]["conv2"], h, dtype=dt)


try:
    tm("v6 folded-space add", head_folded_add, stream, gs_p)
except Exception as e:  # noqa: BLE001
    print("v6 unavailable:", repr(e)[:120], flush=True)
