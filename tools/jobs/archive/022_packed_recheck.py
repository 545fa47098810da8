"""Recheck: packed vs exact render with repeats; computed-table gather micro."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from benchlib import device_time, sync

N = 524288
G_ = 131072
key = jax.random.PRNGKey(0)
tab16 = jax.random.normal(key, (N, 16)).astype(jnp.bfloat16)
tab8 = jax.random.normal(key, (N, 8))
rid = jax.random.randint(key, (G_,), 0, N)

# argument table (as in 016: fast)
print(f"gather arg-(N,8)f32:  {device_time(lambda i: tab8[i], rid, iters=20)*1e3:.3f} ms")
print(f"gather arg-(N,16)bf16: {device_time(lambda i: tab16[i], rid, iters=20)*1e3:.3f} ms")

# computed table (as in bin_splats: table built in-graph from columns)
cols = [jax.random.normal(jax.random.PRNGKey(i), (N,)) for i in range(8)]
def gather_computed(i, *cols):
    t = jnp.stack(cols, axis=-1)  # (N, 8) computed in-graph
    return t[i]
print(f"gather computed-(N,8)f32: {device_time(gather_computed, rid, *cols, iters=20)*1e3:.3f} ms")

# computed via the actual _pack_words path
from vicasplat_tpu.ops.rasterize.tiles import _pack_words, _unpack_words
p16 = jax.random.normal(key, (N, 16))
def gather_packed_path(i, p):
    return _unpack_words(_pack_words(p)[i])
print(f"gather pack->(N,8)->unpack: {device_time(gather_packed_path, rid, p16, iters=20)*1e3:.3f} ms")
def gather_plain16(i, p):
    return p[i]
print(f"gather plain (N,16)f32 arg: {device_time(gather_plain16, rid, p16, iters=20)*1e3:.3f} ms")

# full render packed vs exact, repeats=3
from vicasplat_tpu.ops.rasterize.render import render, RasterizeConfig
ks = jax.random.split(key, 8)
means = jax.random.normal(ks[0], (N, 3)) * jnp.array([0.6, 0.6, 0.3]) + jnp.array([0.0, 0.0, 2.0])
scales = jnp.exp(jax.random.normal(ks[1], (N, 3)) * 0.3) * 0.01
quat = jax.random.normal(ks[2], (N, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
w, x, y, z = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
R = jnp.stack([
    1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
    2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
    2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
], axis=-1).reshape(-1, 3, 3)
cov = jnp.einsum("nij,nj,nkj->nik", R, scales**2, R)
sh = jax.random.normal(ks[3], (N, 3, 25)) * 0.2
opac = jax.nn.sigmoid(jax.random.normal(ks[4], (N,)))
bg = jnp.zeros(3)
V = 12
ext = jnp.broadcast_to(jnp.eye(4), (V, 4, 4))
ext = ext.at[:, 2, 3].set(jnp.linspace(0.0, 0.5, V))
Kmat = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
Ks = jnp.broadcast_to(Kmat, (V, 3, 3))

for packed in (False, True):
    cfg = RasterizeConfig(packed_gather=packed)
    t = device_time(lambda m, e, k: render(m, cov, sh, opac, e, k, (256, 256), bg, 4, cfg=cfg),
                    means, ext, Ks, iters=10, base=2, repeats=3)
    print(f"full render 12v packed={packed} (best of 3): {t*1e3:.1f} ms")
