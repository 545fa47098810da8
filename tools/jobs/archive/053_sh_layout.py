"""SH color-eval layout variants: (N,3,25) vs transposed SoA (25,3,N)."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from benchlib import device_time

from vicasplat_tpu.ops.sh import sh_basis

N = 524288
key = jax.random.PRNGKey(0)
harm = jax.random.normal(key, (N, 3, 25))
harmT = jnp.transpose(harm, (2, 1, 0))  # (25, 3, N)
dirs = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def color_einsum(d):
    b = sh_basis(d, 4)
    return jnp.einsum("ncd,nd->nc", harm, b)


def color_soa(d):
    # basis as a python list of (N,) polys; accumulate 75 scalar FMAs
    b = sh_basis(d, 4)  # (N, 25) - reuse; slicing columns
    cols = [b[:, i] for i in range(25)]
    out = []
    for c in range(3):
        acc = harmT[0, c] * cols[0]
        for i in range(1, 25):
            acc = acc + harmT[i, c] * cols[i]
        out.append(acc)
    return jnp.stack(out, -1)


t = device_time(color_einsum, dirs, iters=25, repeats=2)
print(f"sh color einsum (N,3,25): {t*1e3:.3f} ms")
t = device_time(color_soa, dirs, iters=25, repeats=2)
print(f"sh color SoA (25,3,N): {t*1e3:.3f} ms")

# pure read-bandwidth floor of the table
t = device_time(lambda h: jnp.sum(jnp.abs(h), axis=(1, 2)), harm, iters=25, repeats=2)
print(f"read (N,3,25) reduce: {t*1e3:.3f} ms")
t = device_time(lambda h: jnp.sum(jnp.abs(h), axis=(0, 1)), harmT, iters=25, repeats=2)
print(f"read (25,3,N) reduce: {t*1e3:.3f} ms")
