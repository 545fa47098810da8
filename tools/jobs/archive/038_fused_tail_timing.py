"""Time the fused pallas DPT-tail kernel (ops/dpt_tail.py) vs the XLA tail
at the production shape: (8, 256, 256, 256) + merger -> conv3x3 -> relu ->
conv1x1 -> 82ch (padded 128).

Context numbers (job 034/037): full gs head with XLA tail ~11 ms; the tail
alone carries a ~3-4 ms materialization overhead the kernel removes by
never writing the sum/conv1 activations to HBM. Also times the kernel
inside the full head (trunk + resize + merger feeding it).
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from benchlib import device_time

from vicasplat_tpu.models.heads import DPTConfig, init_dpt, dpt_trunk
from vicasplat_tpu.models.layers import (
    conv2d, conv2d_s2d, resize_bilinear_align_corners,
)
from vicasplat_tpu.ops.dpt_tail import _xla_tail, fused_dpt_tail

BT, size, gh = 8, 256, 16
dt = jnp.bfloat16
hook_dims = (1024, 768, 768, 768)
n_gs = 1 + 7 + 3 * 25
O_pad = 128
gs_cfg = DPTConfig(hook_dims=hook_dims, head_type="gs_params",
                   num_channels=n_gs, use_input_merger=True)

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
gs_p = jax.tree.map(lambda x: x.astype(dt), init_dpt(ks[0], gs_cfg))
hooks = [jax.random.normal(k, (BT, gh * gh, d), dt)
         for k, d in zip(ks[2:6], hook_dims)]
imgs = jax.random.normal(ks[6], (BT, size, size, 3), dt)
stream = {"h": hooks, "im": imgs}

C = gs_p["head"]["conv1"]["w"].shape[-1]
print("feature dim:", C, flush=True)

# pad conv2 to a 128-lane output once
w2 = gs_p["head"]["conv2"]["w"][0, 0]            # (C, n_gs)
b2 = gs_p["head"]["conv2"].get("b")
w2p = jnp.zeros((C, O_pad), dt).at[:, :n_gs].set(w2)
b2p = jnp.zeros((1, O_pad), dt)
if b2 is not None:
    b2p = b2p.at[0, :n_gs].set(b2)

a_in = jax.random.normal(ks[7], (BT, size, size, C), dt)
m_in = jax.nn.relu(jax.random.normal(ks[1], (BT, size, size, C), dt))
w1 = gs_p["head"]["conv1"]["w"]
b1p = jnp.zeros((1, C), dt)


def tm(name, fn, *args, iters=20):
    t = device_time(fn, *args, iters=iters, base=2, repeats=2)
    print(f"{name:44s} {t*1e3:8.3f} ms", flush=True)
    return t


# correctness on chip first
got = np.asarray(
    jax.jit(lambda *a: fused_dpt_tail(*a, 8))(a_in, m_in, w1, b1p, w2p, b2p),
    np.float32)
want = np.asarray(jax.jit(_xla_tail)(a_in, m_in, w1, b1p, w2p, b2p),
                  np.float32)
print("tail maxdiff vs xla:", float(np.abs(got - want).max()),
      "scale:", float(np.abs(want).max()), flush=True)

tm("tail xla (isolated)", _xla_tail, a_in, m_in, w1, b1p, w2p, b2p)
for bh in (4, 8, 16):
    tm(f"tail fused bh={bh} (isolated)",
       lambda a, *r, _bh=bh: fused_dpt_tail(a, *r, _bh),
       a_in, m_in, w1, b1p, w2p, b2p)


def head_xla(st, p):
    p1 = dpt_trunk(p, gs_cfg, st["h"], (gh, gh), dt)
    p1 = resize_bilinear_align_corners(p1, (size, size))
    mm = jax.nn.relu(conv2d_s2d(p["input_merger"]["conv"], st["im"], 7, s=4,
                                dtype=dt))
    h = jax.nn.relu(conv2d(p["head"]["conv1"], p1 + mm, dtype=dt))
    return conv2d(p["head"]["conv2"], h, dtype=dt)


def head_fused(st, p, bh=8):
    p1 = dpt_trunk(p, gs_cfg, st["h"], (gh, gh), dt)
    p1 = resize_bilinear_align_corners(p1, (size, size))
    mm = jax.nn.relu(conv2d_s2d(p["input_merger"]["conv"], st["im"], 7, s=4,
                                dtype=dt))
    w2_ = jnp.zeros((C, O_pad), dt).at[:, :n_gs].set(
        p["head"]["conv2"]["w"][0, 0])
    b2_ = jnp.zeros((1, O_pad), dt)
    if "b" in p["head"]["conv2"]:
        b2_ = b2_.at[0, :n_gs].set(p["head"]["conv2"]["b"])
    out = fused_dpt_tail(p1, mm, p["head"]["conv1"]["w"],
                         jnp.zeros((1, C), dt), w2_, b2_, bh)
    return out[..., :n_gs]


tm("full gs head, xla tail", head_xla, stream, gs_p)
tm("full gs head, fused tail bh=8", head_fused, stream, gs_p)
tm("full gs head, fused tail bh=16",
   lambda st, p: head_fused(st, p, bh=16), stream, gs_p)
