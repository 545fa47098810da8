"""Serving-time splat pruning (decoder prune_fraction) at flagship scale:
12-view 256^2 render over the 8-frame scene's 524k Gaussians at
prune_fraction 0 / 0.25 / 0.5.

The render is sort-bound (12 x 2.1M dup-sort keys); pruning shrinks every
per-view sort/bin/gather/composite for one up-front top_k over (1, 524k).
Re-measures after the packed single-gather fix (six per-field row gathers made pruning a net loss: 56 -> 110 ms at 0.25).
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import json
import pathlib

import jax
import jax.numpy as jnp
from benchlib import device_time

from vicasplat_tpu.decoder.splatting import (
    DecoderSplattingConfig, decoder_forward,
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

ext = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
K = jnp.broadcast_to(
    jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
    (B, V, 3, 3))
near, far = jnp.ones((B, V)) * 0.05, jnp.full((B, V), 100.0)

results = {}
for frac in (0.0, 0.25, 0.5):
    cfg = DecoderSplattingConfig(prune_fraction=frac)

    def run(gg):
        return decoder_forward(cfg, gg, ext, K, near, far, (size, size))

    t = device_time(run, g, iters=20, base=2, repeats=2)
    results[f"prune_{frac}_ms"] = t * 1e3
    print(f"12-view render prune={frac}: {t*1e3:.2f} ms", flush=True)

out = pathlib.Path("/root/repo/outputs/perf_decomposition/prune_render.json")
out.parent.mkdir(parents=True, exist_ok=True)
out.write_text(json.dumps(results, indent=1))
print("job 092_prune_render.py: ok", flush=True)
