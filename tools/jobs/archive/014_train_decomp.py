"""Training-step decomposition at flagship scale (578M, B=1, 8ctx/4tgt,
bf16+remat, donated): split the 301.5 ms/step (job 041) into
forward-loss / backward / optimizer, and measure the per-target-view
render slope (1 vs 4 targets) inside the training graph.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import functools
import time
import numpy as np
import jax
import jax.numpy as jnp

from benchlib import device_time
from vicasplat_tpu.utils.config import load_config
from vicasplat_tpu.main import build_all
from vicasplat_tpu.training.step import compute_loss

cfg = load_config("/root/repo/configs/main.yaml", experiment="re10k_8view")
train_cfg, params, optimizer = build_all(cfg)
print(f"params: {sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M, "
      f"remat={train_cfg.remat}", flush=True)

B, T, size = 1, 8, 256
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


def make_batch(n_tgt):
    return {"context": views(ks[0], T), "target": views(ks[1], n_tgt)}


# batch is streamed (first device_time arg, matching job 041's methodology);
# params ride as a plain jit argument (never captured — compile-service
# hazard, CLAUDE.md round-3 notes)
def fwd_loss(batch, params):
    loss, logs = compute_loss(params, train_cfg, batch, 0)
    return loss

for n_tgt in (4, 1):
    t = device_time(fwd_loss, make_batch(n_tgt), params, iters=20, repeats=2)
    print(f"fwd loss ({n_tgt} tgt)      {t*1e3:7.1f} ms", flush=True)

# 2) value_and_grad, consume grads with sum(abs) per leaf (no optimizer)
def grad_only(batch, params):
    (loss, logs), grads = jax.value_and_grad(
        compute_loss, argnums=0, has_aux=True
    )(params, train_cfg, batch, 0)
    return loss + sum(jnp.sum(jnp.abs(g)).astype(jnp.float32)
                      for g in jax.tree.leaves(grads))

t = device_time(grad_only, make_batch(4), params, iters=20, repeats=2)
print(f"fwd+bwd (4 tgt)        {t*1e3:7.1f} ms", flush=True)

print("full step reference (job 041): 301.5 ms -> optimizer+guard ~= "
      "full - fwd+bwd (minus the grad-abs consume traversal)")
