"""Round-5: decompose the non-fwd/bwd slice of the 578M train step
(VERDICT r4 weak #6). At the dots-policy config the full step is ~261 ms;
fwd+bwd was 236.1 at policy=none (never re-measured at dots). Itemize:
grads-only (value_and_grad + NaN guard), the guard itself, optimizer
update+apply, global_norm — find where the remainder goes.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import dataclasses
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from benchlib import device_time
from vicasplat_tpu.utils.config import load_config
from vicasplat_tpu.main import build_all
from vicasplat_tpu.training import make_train_step
from vicasplat_tpu.training.step import compute_loss

cfg = load_config("/root/repo/configs/main.yaml", experiment="re10k_8view")
train_cfg, params, optimizer = build_all(cfg)
assert train_cfg.remat_policy == "dots", train_cfg.remat_policy
opt_state = optimizer.init(params)
train_step = make_train_step(train_cfg, optimizer)
print(f"params: {sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M, "
      f"policy={train_cfg.remat_policy}", flush=True)

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
results = {}

# --- 1. full step (donated carry, archive job 015 pattern) -----------------
@functools.partial(jax.jit, donate_argnums=(1, 2))
def loop_full(eps_arr, params, opt_state):
    def body(carry, eps):
        p, o = carry
        b = dict(batch, context=dict(batch["context"],
                                     image=batch["context"]["image"] + eps))
        p, o, logs = train_step(p, o, b, 0)
        return (p, o), logs["loss"]

    (p, o), losses = jax.lax.scan(body, (params, opt_state), eps_arr)
    return p, o, jnp.broadcast_to(losses.sum(), (8, 128))

def run_full(n):
    global params, opt_state
    t0 = time.perf_counter()
    params, opt_state, acc = loop_full(jnp.zeros((n,), jnp.float32), params,
                                       opt_state)
    _ = float(np.asarray(jax.device_get(acc)).sum())
    return time.perf_counter() - t0

t0 = time.time()
run_full(1)
print(f"full compile+first: {time.time()-t0:.1f}s", flush=True)
run_full(6)
t1 = min(run_full(1) for _ in range(2))
t6 = min(run_full(6) for _ in range(2))
results["full_step"] = (t6 - t1) / 5 * 1e3
print(f"full step: {results['full_step']:.1f} ms", flush=True)

# --- 2. grads only (with NaN guard), returns loss+grad_norm ----------------
def grads_fn(params, batch, guard=True):
    (loss, logs), grads = jax.value_and_grad(compute_loss, has_aux=True)(
        params, train_cfg, batch, 0, None, None,
        jax.random.PRNGKey(0), "full", None, "data")
    if guard:
        grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), grads)
    return loss + optax.global_norm(grads)

t = device_time(lambda b, p: grads_fn(p, b, True), batch, params,
                iters=6, base=1)
results["grads_guarded"] = t * 1e3
print(f"grads (guarded) + norm: {t*1e3:.1f} ms", flush=True)

t = device_time(lambda b, p: grads_fn(p, b, False), batch, params,
                iters=6, base=1)
results["grads_noguard"] = t * 1e3
print(f"grads (no guard) + norm: {t*1e3:.1f} ms", flush=True)

# --- 3. optimizer update + apply alone on fixed grads ----------------------
grads = jax.jit(jax.grad(
    lambda p, b: compute_loss(p, train_cfg, b, 0, None, None,
                              jax.random.PRNGKey(0), "full", None,
                              "data")[0]))(params, batch)
grads = jax.block_until_ready(grads)

@functools.partial(jax.jit, donate_argnums=(1, 2))
def loop_opt(eps_arr, params, opt_state, grads):
    def body(carry, eps):
        p, o = carry
        # perturb one leaf so the update can't be hoisted out of the scan
        leaves, treedef = jax.tree.flatten(grads)
        leaves[0] = leaves[0] + eps
        g = jax.tree.unflatten(treedef, leaves)
        updates, o = optimizer.update(g, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o), jnp.float32(0.0)

    (p, o), _ = jax.lax.scan(body, (params, opt_state), eps_arr)
    probe = jax.tree.leaves(p)[0]
    return p, o, jnp.sum(jnp.abs(probe)).astype(jnp.float32)

def run_opt(n):
    global params, opt_state
    t0 = time.perf_counter()
    params, opt_state, acc = loop_opt(jnp.zeros((n,), jnp.float32), params,
                                      opt_state, grads)
    _ = float(np.asarray(jax.device_get(acc)))
    return time.perf_counter() - t0

run_opt(2), run_opt(12)
t2 = min(run_opt(2) for _ in range(2))
t12 = min(run_opt(12) for _ in range(2))
results["opt_update"] = (t12 - t2) / 10 * 1e3
print(f"optimizer update+apply: {results['opt_update']:.2f} ms", flush=True)

# --- 4. global_norm alone ---------------------------------------------------
t = device_time(lambda g: optax.global_norm(g), grads, iters=20)
results["global_norm"] = t * 1e3
print(f"global_norm(grads): {t*1e3:.2f} ms", flush=True)

results["residual"] = results["full_step"] - results["grads_guarded"] - \
    results["opt_update"]
print("RESULT " + json.dumps({k: round(v, 2) for k, v in results.items()}))
