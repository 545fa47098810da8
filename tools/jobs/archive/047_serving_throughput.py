"""Serving-engine throughput: reconstruction scenes/sec vs batch size."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vicasplat_tpu.models import GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig
from vicasplat_tpu.serving import InferenceEngine

cfg = VicaSplatConfig(backbone=VicaNetConfig(),
                      gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
eng = InferenceEngine(cfg)
T, size = 8, 256
Km = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
for B in (1, 2, 4):
    imgs = jax.random.uniform(jax.random.PRNGKey(B), (B, T, size, size, 3))
    K = jnp.broadcast_to(Km, (B, T, 3, 3))
    r = eng.throughput(imgs, K, iters=10)
    print(f"B={B}: {r['latency_s']*1e3:.1f} ms/batch, "
          f"{r['scenes_per_s']:.2f} scenes/s")
