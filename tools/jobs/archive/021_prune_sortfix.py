"""Prune trade curve after replacing lax.top_k with a pair-sort + slice.

Job 012 (top_k selection + one packed gather): 12-view render 48.6 / 69.0 /
63.1 ms at prune 0 / .25 / .5 — top_k with k ~ 0.75N is a full sort through
a slow code path. This job isolates the selection/gather costs and re-runs
the decoder_forward trade curve with the sort-based prune_gaussians.
"""
import sys

for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import json
import pathlib

import jax
import jax.numpy as jnp
from benchlib import device_time

from vicasplat_tpu.decoder.splatting import (
    DecoderSplattingConfig, decoder_forward, prune_gaussians,
)
from vicasplat_tpu.models.adapter import Gaussians

B, T, size, V = 1, 8, 256, 12
N = T * size * size
ks = jax.random.split(jax.random.PRNGKey(0), 6)
means = jax.random.normal(ks[0], (B, N, 3)) * 0.5
means = means.at[..., 2].add(2.5)
scales = jax.random.uniform(ks[1], (B, N, 3), minval=0.003, maxval=0.02)
q = jax.random.normal(ks[2], (B, N, 4))
rotations = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
sh = jax.random.uniform(ks[3], (B, N, 3, 25))
opac = jax.random.uniform(ks[4], (B, N))
g = Gaussians(means, None, sh, opac, scales, rotations)

results = {}

# --- isolate: selection variants + the packed gather ---
for k in (393216, 262144):
    t = device_time(lambda o: jax.lax.top_k(o, k)[1], opac, iters=10, repeats=3)
    results[f"topk_{k}_ms"] = round(t * 1e3, 3)
    print(f"top_k k={k}: {t*1e3:.2f} ms", flush=True)
    iota = jnp.arange(N, dtype=jnp.int32)
    t = device_time(
        lambda o: jax.lax.sort((-o[0], iota), num_keys=1,
                               is_stable=False)[1][:k],
        opac, iters=10, repeats=3)
    results[f"sortslice_{k}_ms"] = round(t * 1e3, 3)
    print(f"sort+slice k={k}: {t*1e3:.2f} ms", flush=True)

packed = jax.random.normal(ks[5], (B, N, 95))
idx = jax.lax.sort((-opac[0], jnp.arange(N, dtype=jnp.int32)),
                   num_keys=1, is_stable=False)[1][None]
for k in (393216, 262144):
    t = device_time(
        lambda p: jnp.take_along_axis(p, idx[:, :k, None], axis=1),
        packed, iters=10, repeats=3)
    results[f"gather_{k}x95_ms"] = round(t * 1e3, 3)
    print(f"packed gather {k}x95: {t*1e3:.2f} ms", flush=True)

# --- full prune op ---
for frac in (0.25, 0.5):
    t = device_time(lambda gg: prune_gaussians(gg, frac), g,
                    iters=10, repeats=3)
    results[f"prune_op_{frac}_ms"] = round(t * 1e3, 3)
    print(f"prune_gaussians({frac}): {t*1e3:.2f} ms", flush=True)

# --- decoder trade curve with sort-based prune ---
ext = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
K = jnp.broadcast_to(
    jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
    (B, V, 3, 3))
near, far = jnp.ones((B, V)) * 0.05, jnp.full((B, V), 100.0)
for frac in (0.0, 0.25, 0.5):
    cfg = DecoderSplattingConfig(prune_fraction=frac)

    def run(gg):
        return decoder_forward(cfg, gg, ext, K, near, far, (size, size))

    t = device_time(run, g, iters=20, base=2, repeats=3)
    results[f"prune_{frac}_ms"] = round(t * 1e3, 3)
    print(f"12-view render prune={frac}: {t*1e3:.2f} ms", flush=True)

out = pathlib.Path("/root/repo/outputs/perf_decomposition/prune_render.json")
out.parent.mkdir(parents=True, exist_ok=True)
out.write_text(json.dumps(results, indent=1))
print("wrote", out)
