"""Honest full-scale training-step timing (578M params, B=1, 8 ctx, 4 tgt)."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import time
import jax
import jax.numpy as jnp
from benchlib import device_time, sync

from vicasplat_tpu.utils.config import load_config
from vicasplat_tpu.main import build_all
from vicasplat_tpu.training import make_train_step

cfg = load_config("/root/repo/configs/main.yaml", experiment="re10k_8view")
train_cfg, params, optimizer = build_all(cfg)
n_params = sum(x.size for x in jax.tree.leaves(params))
print(f"params: {n_params/1e6:.1f}M, remat={train_cfg.remat}, dtype={train_cfg.dtype}")

opt_state = optimizer.init(params)
step_fn = jax.jit(make_train_step(train_cfg, optimizer),
                  static_argnames=("phase",))

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

t0 = time.time()
p2, o2, logs = step_fn(params, opt_state, batch, 0)
sync(logs["loss"])
print(f"first step: {time.time()-t0:.1f}s  loss={float(logs['loss']):.4f}")

def one(img, params, opt_state):
    b = dict(batch, context=dict(batch["context"], image=img))
    p2, o2, logs = step_fn.__wrapped__(params, opt_state, b, 0)
    return logs["loss"], p2["backbone"]["enc_norm"]["scale"], o2 if False else logs["grad_norm"]

t = device_time(one, batch["context"]["image"], params, opt_state,
                iters=6, base=2, repeats=2)
print(f"train step (B=1, 8ctx/4tgt): {t*1e3:.1f} ms/step ({1.0/t:.2f} it/s)")
