"""Attention implementation shootout on the decoder/encoder shapes."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import functools
import math
import jax
import jax.numpy as jnp
from benchlib import device_time

B, T, N = 1, 8, 257
S = T * N  # 2056


def qkv(shape, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, shape, jnp.bfloat16) for k in ks)


def attn_einsum(q, k, v):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(q.shape[-1])
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def attn_einsum_bf16sm(q, k, v):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(q.shape[-1])
    m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp((s - m).astype(jnp.float32)).astype(q.dtype)
    p = e / jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def attn_sdpa(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


shapes = {
    "dec joint (1,2056,12,64)": (B, S, 12, 64),
    "enc (8,257,16,64)": (T, N, 16, 64),
    "xneib q(8,256,12,64) k512": None,
}

for tag, shp in shapes.items():
    if shp is not None:
        q, k, v = qkv(shp)
        flops = 4 * shp[0] * shp[1] * shp[1] * shp[2] * shp[3]
        for name, fn in [("sdpa", attn_sdpa), ("einsum", attn_einsum),
                         ("einsum-bf16sm", attn_einsum_bf16sm)]:
            t = device_time(fn, q, k, v, iters=50, base=5, repeats=2)
            print(f"{tag} {name}: {t*1e3:.3f} ms ({flops/t/1e12:.0f} TF/s)")

# cross-neighbor shape: q (8,256,12,64), kv (8,512,12,64)
q, _, _ = qkv((8, 256, 12, 64), 1)
_, k, v = qkv((8, 512, 12, 64), 2)
flops = 4 * 8 * 256 * 512 * 12 * 64
for name, fn in [("sdpa", attn_sdpa), ("einsum", attn_einsum)]:
    t = device_time(fn, q, k, v, iters=50, base=5, repeats=2)
    print(f"xneib {name}: {t*1e3:.3f} ms ({flops/t/1e12:.0f} TF/s)")

# masked camera-query attention folded into one joint call:
# queries = cam(8) + img(2048), mask only on cam rows
qj, kj, vj = qkv((B, S + T, 12, 64), 3)
mask = jnp.ones((1, 1, S + T, S), dtype=bool)
def attn_einsum_mask(q, k, v):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(q.shape[-1])
    s = jnp.where(mask, s, -1e9)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)
kj2, vj2 = kj[:, :S], vj[:, :S]
t = device_time(attn_einsum_mask, qj, kj2, vj2, iters=50, base=5, repeats=2)
print(f"joint+cam masked einsum (2064q,2056k): {t*1e3:.3f} ms")

# flash attention (pallas TPU kernel), needs BHSD
try:
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    q, k, v = qkv((B, S, 12, 64))
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    def fa(qt, kt, vt):
        return flash_attention(qt, kt, vt, causal=False,
                               sm_scale=1.0 / math.sqrt(64))

    t = device_time(fa, qt, kt, vt, iters=50, base=5, repeats=2)
    flops = 4 * B * S * S * 12 * 64
    print(f"dec joint flash-pallas: {t*1e3:.3f} ms ({flops/t/1e12:.0f} TF/s)")
except Exception as e:
    print("flash attention unavailable/failed:", type(e).__name__, str(e)[:200])
