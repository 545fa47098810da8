"""Flagship vicasplat_forward with the fused pallas DPT tails vs XLA tails
(follow-up to job 038's isolated tail timing; ops/dpt_tail.py).

Also checks output agreement at model scale on chip. If the fused path
wins here, head_tail_backend flips to "auto" in VicaSplatConfig and the
bench should drop by the same margin (heads were 12.9 ms of the 45.9 ms
forward — DESIGN.md §2).
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from benchlib import device_time

from vicasplat_tpu.models import init_vicasplat
from vicasplat_tpu.models.vicasplat import VicaSplatConfig, vicasplat_forward

B, T, S = 1, 8, 256
cfg_x = VicaSplatConfig()
cfg_p = dataclasses.replace(cfg_x, head_tail_backend="pallas")

key = jax.random.PRNGKey(0)
params = init_vicasplat(key, cfg_x)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                      if x.dtype == jnp.float32 else x, params)
ks = jax.random.split(key, 3)
batch = {
    "image": jax.random.uniform(ks[0], (B, T, S, S, 3)) * 2 - 1,
    "intrinsics": jnp.broadcast_to(
        jnp.array([[[0.9, 0, 0.5], [0, 0.9, 0.5], [0, 0, 1.0]]]),
        (B, T, 3, 3)),
}

fx = jax.jit(lambda p, b: vicasplat_forward(p, cfg_x, b, dtype=jnp.bfloat16))
fp = jax.jit(lambda p, b: vicasplat_forward(p, cfg_p, b, dtype=jnp.bfloat16))

ox = fx(params, batch)
op = fp(params, batch)
for k in ("gaussians",):
    gx, gp = ox[k], op[k]
    for field in ("means", "opacities", "harmonics"):
        a = np.asarray(getattr(gx, field), np.float32)
        b = np.asarray(getattr(gp, field), np.float32)
        d = float(np.abs(a - b).max())
        s = float(np.abs(a).max())
        print(f"{field}: maxdiff {d:.5g} (scale {s:.4g})", flush=True)


def tm(name, fn, *args, iters=20):
    t = device_time(fn, *args, iters=iters, base=2, repeats=2)
    print(f"{name:40s} {t*1e3:8.3f} ms", flush=True)
    return t


def loss_like(out):
    return out


tm("forward, xla tails",
   lambda b, p: vicasplat_forward(p, cfg_x, b, dtype=jnp.bfloat16),
   batch, params)
tm("forward, fused pallas tails",
   lambda b, p: vicasplat_forward(p, cfg_p, b, dtype=jnp.bfloat16),
   batch, params)
