"""Train-step timing with encoder flash on/off (follows jobs 046/047).

The decoder already trains through the Pallas flash kernel under the dots
remat policy (re10k configs); this sizes the same move for the encoder's
24 blocks at the flagship 578M config, B=1 8-view (8 ctx / 4 tgt).
Baseline: 251.5 ms/step (train_mfu.json).
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import dataclasses
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from vicasplat_tpu.utils.config import load_config
from vicasplat_tpu.main import build_all
from vicasplat_tpu.training import make_train_step

cfg = load_config("/root/repo/configs/main.yaml", experiment="re10k_8view")
train_cfg, params, optimizer = build_all(cfg)
size = 256
Km = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])


def views(k, b, n):
    return {
        "image": jax.random.uniform(k, (b, n, size, size, 3)),
        "intrinsics": jnp.broadcast_to(Km, (b, n, 3, 3)),
        "extrinsics": jnp.broadcast_to(jnp.eye(4), (b, n, 4, 4)),
        "near": jnp.ones((b, n)),
        "far": jnp.full((b, n), 100.0),
        "index": jnp.arange(n)[None].repeat(b, 0),
    }


ks = jax.random.split(jax.random.PRNGKey(1), 2)
batch = {"context": views(ks[0], 1, 8), "target": views(ks[1], 1, 4)}

for enc_flash in (False, True):
    bb = dataclasses.replace(train_cfg.model.backbone,
                             enc_use_flash_attention=enc_flash)
    model = dataclasses.replace(train_cfg.model, backbone=bb)
    tc = dataclasses.replace(train_cfg, model=model)
    train_step = make_train_step(tc, optimizer)
    opt_state = optimizer.init(params)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def loop(eps_arr, p0, o0, batch):
        def body(carry, eps):
            p, o = carry
            bb_ = dict(batch, context=dict(
                batch["context"], image=batch["context"]["image"] + eps))
            p, o, logs = train_step(p, o, bb_, 0)
            return (p, o), logs["loss"]

        (p, o), losses = jax.lax.scan(body, (p0, o0), eps_arr)
        return p, o, jnp.broadcast_to(losses.sum(), (8, 128))

    def run(n, p0, o0):
        t0 = time.perf_counter()
        p1, o1, acc = loop(jnp.zeros((n,), jnp.float32), p0, o0, batch)
        np.asarray(jax.device_get(acc)).sum()
        return time.perf_counter() - t0, p1, o1

    # real buffer copies: the loop donates p0/opt_state, and identity
    # tree.map would donate params' own buffers, killing the second pass
    p0 = jax.tree.map(jnp.copy, params)
    _, p0, opt_state = run(2, p0, opt_state)      # warm both shapes
    _, p0, opt_state = run(10, p0, opt_state)
    t2a, p0, opt_state = run(2, p0, opt_state)
    t10a, p0, opt_state = run(10, p0, opt_state)
    t2b, p0, opt_state = run(2, p0, opt_state)
    t10b, p0, opt_state = run(10, p0, opt_state)
    ms = (min(t10a, t10b) - min(t2a, t2b)) / 8 * 1e3
    print(f"train step 578M B=1 8-view enc_flash={enc_flash}: {ms:8.2f} "
          f"ms/step", flush=True)
    del p0, opt_state, train_step, loop
