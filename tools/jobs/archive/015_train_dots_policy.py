"""Full-scale train step with remat_policy='dots' (save matmul outputs
across the scan boundary, recompute only elementwise in the backward) vs
the baseline full-recompute 301.5 ms/step (job 041). Memory check included
— saved dots ~2-3 GB beside the 9.2 GB params+moments+grads on 16 GB HBM.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import dataclasses
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp

from vicasplat_tpu.utils.config import load_config
from vicasplat_tpu.main import build_all
from vicasplat_tpu.training import make_train_step

cfg = load_config("/root/repo/configs/main.yaml", experiment="re10k_8view")
train_cfg, params, optimizer = build_all(cfg)
train_cfg = dataclasses.replace(train_cfg, remat_policy="dots")
print(f"params: {sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M, "
      f"remat={train_cfg.remat}, policy={train_cfg.remat_policy}", flush=True)
opt_state = optimizer.init(params)
train_step = make_train_step(train_cfg, optimizer)

B, T, size, n_tgt = 1, 8, 256, 4
ks = jax.random.split(jax.random.PRNGKey(1), 4)
Km = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])

def views(k, n):
    return {
        "image": jax.random.uniform(k, (B, n, size, size, 3)),
        "intrinsics": jnp.broadcast_to(Km, (B, n, 3, 3)),
        "extrinsics": jnp.broadcast_to(jnp.eye(4), (B, n, 4, 4)),
        "near": jnp.ones((B, n)),
        "far": jnp.full((B, n), 100.0),
        "index": jnp.arange(n)[None].repeat(B, 0),
    }

batch = {"context": views(ks[0], T), "target": views(ks[1], n_tgt)}


@functools.partial(jax.jit, donate_argnums=(1, 2), static_argnums=(3,))
def loop(eps_arr, params, opt_state, n):
    def body(carry, eps):
        p, o = carry
        b = dict(batch, context=dict(batch["context"],
                                     image=batch["context"]["image"] + eps))
        p, o, logs = train_step(p, o, b, 0)
        return (p, o), logs["loss"]

    (p, o), losses = jax.lax.scan(body, (params, opt_state), eps_arr)
    return p, o, jnp.broadcast_to(losses.sum(), (8, 128))


def run(n):
    global params, opt_state
    t0 = time.perf_counter()
    params, opt_state, acc = loop(jnp.zeros((n,), jnp.float32), params,
                                  opt_state, n)
    _ = float(np.asarray(jax.device_get(acc)).sum())
    return time.perf_counter() - t0

t0 = time.time()
_ = run(1)
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
_ = run(6)
t1 = run(1)
t6 = run(6)
dt = (t6 - t1) / 5
print(f"train step dots-policy (578M, B=1, 8ctx/4tgt, donated): "
      f"{dt*1e3:.1f} ms/step ({1.0/dt:.2f} it/s)  [baseline 301.5]")
