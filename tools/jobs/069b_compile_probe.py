"""Probe the scan-wrapped-forward compile that killed job 067 twice.

Both attempts died in `remote_compile: Broken pipe` ~29 min into the job,
at the FIRST device_time of the flagship forward — i.e. the XLA compile of
scan(vicasplat_forward) exceeds what the tunnel's compile service will
serve, while the un-scanned forward compiles fine (jobs 068/068b). This
job instruments the stages with timestamps and jax_log_compiles to find
whether it's a per-request timeout (reproducible duration) and which graph
is pathological:
  A. jit(fwd)            -- expect persistent-cache hit, seconds
  B. scan(fwd) iters=2   -- the suspect
  C. scan(fwd) iters=20  -- only if B survives
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_log_compiles", True)

from benchlib import _make_loop, sync

from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig,
    init_vicasplat, vicasplat_forward,
)

cfg = VicaSplatConfig(backbone=VicaNetConfig(),
                      gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
B, T, size = 1, 8, 256
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vicasplat(jax.random.PRNGKey(0), cfg))
K = jnp.broadcast_to(
    jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (B, T, 3, 3))
imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, size, size, 3)) * 2 - 1

fwd = jax.jit(lambda im, p: vicasplat_forward(
    p, cfg, {"image": im, "intrinsics": K}, dtype=jnp.bfloat16))

t0 = time.time()
out = fwd(imgs, params)
sync(out["gaussians"].means[0, 0, 0])
print(f"[A] jit(fwd) ready in {time.time()-t0:.1f}s", flush=True)

loop = _make_loop(lambda im: fwd(im, params))
t0 = time.time()
try:
    sync(loop(jnp.zeros((2,), jnp.float32), imgs))
    print(f"[B] scan(fwd) iters=2 ready in {time.time()-t0:.1f}s", flush=True)
except Exception as e:
    print(f"[B] FAILED after {time.time()-t0:.1f}s: "
          f"{type(e).__name__}: {str(e)[:300]}", flush=True)
    raise SystemExit

t0 = time.time()
try:
    sync(loop(jnp.zeros((20,), jnp.float32), imgs))
    print(f"[C] scan(fwd) iters=20 ready in {time.time()-t0:.1f}s", flush=True)
except Exception as e:
    print(f"[C] FAILED after {time.time()-t0:.1f}s: "
          f"{type(e).__name__}: {str(e)[:300]}", flush=True)
