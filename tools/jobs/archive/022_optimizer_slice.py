"""Optimizer-slice decomposition at flagship scale (578M params).

Job 014: fwd+bwd (4 tgt) = 236.1 ms vs full step 301.5 (policy=none)
=> optimizer + NaN-guard + clip ~ 65 ms. Bandwidth roofline for
AdamW@578M f32 (read g,m,v,p; write m,v,p) is ~16 GB / 819 GB/s ~ 20 ms,
so 65 ms would be 3x off the floor. This job times the pieces in
isolation, all donated, params passed as arguments (never captured):

  a) adamw.update + apply_updates        (the core)
  b) + clip_by_global_norm               (chain as shipped)
  c) + NaN guard (isfinite where)        (training/step.py:208)
  d) + grad_norm log (optax.global_norm) (step.py:256)

If (d) ~ roofline, the 65 ms was the measurement's consume traversal and
there is nothing to chase; otherwise the slow link is identified.
"""
import sys

for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from benchlib import sync

from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig, init_vicasplat,
)
from vicasplat_tpu.training.optimizer import OptimizerConfig, make_optimizer

cfg = VicaSplatConfig(backbone=VicaNetConfig(),
                      gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
params = init_vicasplat(jax.random.PRNGKey(0), cfg)
n_par = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
print(f"params: {n_par/1e6:.1f}M f32", flush=True)

ocfg = OptimizerConfig()
opt = make_optimizer(params, ocfg)
opt_state = opt.init(params)
# fake grads: scaled params (cheap to synthesize, realistic magnitudes)
grads = jax.tree.map(lambda p: p * 1e-3 + 1e-6, params)


def core(p, s, g):
    u, s2 = opt.update(g, s, p)
    return optax.apply_updates(p, u), s2


def with_guard(p, s, g):
    bad = jnp.logical_not(
        jnp.all(jnp.asarray([jnp.all(jnp.isfinite(x))
                             for x in jax.tree.leaves(g)])))
    g = jax.tree.map(lambda x: jnp.where(jnp.isfinite(x), x, 0.0), g)
    u, s2 = opt.update(g, s, p)
    p2 = optax.apply_updates(p, u)
    p2 = jax.tree.map(lambda a, b: jnp.where(bad, a, b), p, p2)
    return p2, s2


def with_log(p, s, g):
    p2, s2 = with_guard(p, s, g)
    return p2, s2, optax.global_norm(g)


# dispatch-differenced timing with donation: each call consumes and
# reproduces the same buffers, so N sequential dispatches are honest
# (the in-scan method can't donate a carried pytree of this size without
# doubling HBM).
def t_donated(name, fn, n_out):
    f = jax.jit(fn, donate_argnums=(0, 1))
    p = jax.tree.map(jnp.asarray, params)
    s = jax.tree.map(jnp.asarray, opt_state)
    out = f(p, s, grads)
    sync(jax.tree.leaves(out[0])[0].ravel()[:128])  # compile + settle
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(out[0], out[1], grads)
    sync(jax.tree.leaves(out[0])[0].ravel()[:128])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e3:8.2f} ms/iter (dispatch-inclusive)", flush=True)
    return dt


t_donated("adamw+apply (core)", core, 1)
t_donated("+ nan guard", with_guard, 1)
t_donated("+ grad_norm log", with_log, 1)

# trivial dispatch to subtract the ~50-70 ms overhead
trivial = jax.jit(lambda x: x + 1.0)
tiny = jnp.zeros((8, 128), jnp.float32)
sync(trivial(tiny))
t0 = time.perf_counter()
for _ in range(20):
    tiny = trivial(tiny)
sync(tiny)
print(f"trivial dispatch overhead: {(time.perf_counter()-t0)/20*1e3:.2f} ms",
      flush=True)
