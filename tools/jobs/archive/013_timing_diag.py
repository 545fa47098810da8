"""Timing-methodology diagnostics on the axon tunnel.

Known-FLOP matmul: 4096^3 bf16 = 137.4 GFLOP; v5e peak ~197 TFLOP/s
=> ~0.70 ms at peak, ~1.4 ms at 50%.

Tests: (a) out-of-jit loop + single-element pull, (b) out-of-jit loop +
full device_get, (c) in-jit scan loop, (d) sleep-drain then single call,
(e) project_gaussians single call with sleep-drain.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")]:
    del sys.modules[m]
import time
import jax
import jax.numpy as jnp
import numpy as np

M = 4096
a = jax.random.normal(jax.random.PRNGKey(0), (M, M), jnp.bfloat16)
b = jax.random.normal(jax.random.PRNGKey(1), (M, M), jnp.bfloat16)
mm = jax.jit(lambda a, b: a @ b)

# warm + drain
c = mm(a, b)
_ = np.asarray(jax.device_get(c)).sum()
time.sleep(2)

# (a) out-of-jit loop, single-element pull
t0 = time.perf_counter()
c = a
for _ in range(20):
    c = mm(c, b)
_ = float(c.ravel()[0])
ta = (time.perf_counter() - t0) / 20
print(f"(a) matmul chained out-of-jit, elem pull: {ta*1e3:.3f} ms "
      f"({137.4/ta/1e3:.1f} TFLOP/s)")
time.sleep(2)

# (b) out-of-jit loop, full device_get at end
t0 = time.perf_counter()
c = a
for _ in range(20):
    c = mm(c, b)
_ = np.asarray(jax.device_get(c)).sum()
tb = (time.perf_counter() - t0) / 20
print(f"(b) matmul chained out-of-jit, device_get: {tb*1e3:.3f} ms "
      f"({137.4/tb/1e3:.1f} TFLOP/s)")
time.sleep(2)

# (c) in-jit scan loop
@jax.jit
def loop(a, b):
    def body(c, _):
        return c @ b, None
    c, _ = jax.lax.scan(body, a, None, length=20)
    return c

_ = float(loop(a, b).ravel()[0])
time.sleep(2)
t0 = time.perf_counter()
c = loop(a, b)
_ = float(c.ravel()[0])
tc = (time.perf_counter() - t0) / 20
print(f"(c) matmul in-jit scan20: {tc*1e3:.3f} ms ({137.4/tc/1e3:.1f} TFLOP/s)")
time.sleep(2)

# (d) single dispatch after drain
t0 = time.perf_counter()
c = mm(a, b)
_ = float(c.ravel()[0])
td = time.perf_counter() - t0
print(f"(d) single matmul after drain: {td*1e3:.3f} ms")
time.sleep(2)

# (e) project_gaussians, drained single + chained
from vicasplat_tpu.ops.rasterize.projection import project_gaussians
N = 524288
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
means = jax.random.normal(ks[0], (N, 3)) * 0.5 + jnp.array([0.0, 0.0, 2.0])
cov = jnp.broadcast_to(jnp.eye(3) * 1e-4, (N, 3, 3))
sh = jax.random.normal(ks[3], (N, 3, 25)) * 0.2
opac = jax.nn.sigmoid(jax.random.normal(ks[4], (N,)))
viewmat = jnp.eye(4)
Kmat = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])

proj = jax.jit(lambda m: project_gaussians(m, cov, sh, opac, viewmat, Kmat, (256, 256), 4))
s = proj(means)
_ = np.asarray(jax.device_get(s.mean2d)).sum()
time.sleep(2)
t0 = time.perf_counter()
s = proj(means)
_ = float(s.mean2d.ravel()[0])
print(f"(e1) single project after drain: {(time.perf_counter()-t0)*1e3:.3f} ms")
time.sleep(2)
t0 = time.perf_counter()
for _ in range(20):
    s = proj(means + 0.0)
_ = float(s.mean2d.ravel()[0])
print(f"(e2) project x20 out-of-jit: {(time.perf_counter()-t0)/20*1e3:.3f} ms")
time.sleep(2)
# (e3) does the elem pull actually wait? queue 20 projects, pull, then time a
# full device_get of the last result — if pull didn't wait, this is huge.
for _ in range(20):
    s = proj(means + 0.0)
_ = float(s.mean2d.ravel()[0])
t0 = time.perf_counter()
_ = np.asarray(jax.device_get(s.mean2d)).sum()
print(f"(e3) residual device_get after elem pull: {(time.perf_counter()-t0)*1e3:.3f} ms")
