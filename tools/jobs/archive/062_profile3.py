"""Capture a jax.profiler trace of the e2e and print top ops by duration."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu")]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo")

import glob
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig,
    init_vicasplat, vicasplat_forward,
)
from vicasplat_tpu.decoder.splatting import DecoderSplattingConfig, decoder_forward

cfg = VicaSplatConfig(backbone=VicaNetConfig(),
                      gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
B, T, size, V = 1, 8, 256, 12
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vicasplat(jax.random.PRNGKey(0), cfg))
K = jnp.broadcast_to(
    jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (B, T, 3, 3))
imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, size, size, 3)) * 2 - 1
tgt_ext = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
tgt_ext = tgt_ext.at[:, :, 2, 3].set(jnp.linspace(0.0, 0.5, V)[None])
tgt_K = jnp.broadcast_to(K[:, :1], (B, V, 3, 3))
dec_cfg = DecoderSplattingConfig()


@jax.jit
def e2e(im, p):
    out = vicasplat_forward(p, cfg, {"image": im, "intrinsics": K}, dtype=jnp.bfloat16)
    r = decoder_forward(dec_cfg, out["gaussians"], tgt_ext, tgt_K,
                        jnp.ones((B, V)), jnp.full((B, V), 100.0), (size, size))
    return r.color, out["gaussian_camera_extrins"]


c, p_ = e2e(imgs, params)
_ = np.asarray(jax.device_get(c)).sum()

logdir = "/tmp/jaxprof"
shutil.rmtree(logdir, ignore_errors=True)
try:
    with jax.profiler.trace(logdir):
        for _ in range(3):
            c, p_ = e2e(imgs, params)
        _ = np.asarray(jax.device_get(c)).sum()
    files = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    print("trace files:", files)
    if files:
        from tensorflow.core.profiler.protobuf import xplane_pb2

        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(files[0], "rb").read())
        print("planes:", [p.name for p in xs.planes])
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            evs = {}
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    name = meta.get(ev.metadata_id, "?")
                    evs[name] = evs.get(name, 0) + ev.duration_ps
            top = sorted(evs.items(), key=lambda kv: -kv[1])[:40]
            tot = sum(evs.values())
            print(f"plane {plane.name}: total {tot/1e12*1e3:.1f} ms-ish")
            for name, ps in top:
                print(f"  {ps/1e9:10.3f} ms  {name[:110]}")
            break
except Exception as e:
    print("profiling failed:", type(e).__name__, str(e)[:300])
