"""Probe dryrun_multichip configs: compile the train step on an 8-virtual-
device CPU mesh, count collectives in the optimized HLO, and (optionally)
time one step. Run CPU-only:

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/probe_multichip.py [--run] [--size 64] [--enc-depth 12] ...
"""
import argparse
import collections
import re
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--T", type=int, default=3)
    ap.add_argument("--V", type=int, default=2)
    ap.add_argument("--enc-dim", type=int, default=768)
    ap.add_argument("--enc-depth", type=int, default=12)
    ap.add_argument("--dec-dim", type=int, default=384)
    ap.add_argument("--dec-depth", type=int, default=4)
    ap.add_argument("--sh", type=int, default=4)
    args = ap.parse_args()

    from vicasplat_tpu.models import (
        GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig, init_vicasplat,
    )
    from vicasplat_tpu.parallel import make_mesh, replicate, shard_batch
    from vicasplat_tpu.training import OptimizerConfig, TrainConfig, make_train_step
    from vicasplat_tpu.training.optimizer import make_optimizer
    from vicasplat_tpu.decoder.splatting import DecoderSplattingConfig
    from vicasplat_tpu.ops.rasterize import RasterizeConfig

    n = 8
    size, T, V = args.size, args.T, args.V
    backbone = VicaNetConfig(
        img_size=size, patch_size=16,
        enc_embed_dim=args.enc_dim, enc_depth=args.enc_depth,
        enc_num_heads=args.enc_dim // 64,
        dec_embed_dim=args.dec_dim, dec_depth=args.dec_depth,
        dec_num_heads=args.dec_dim // 64,
    )
    adapter = GaussianAdapterConfig(sh_degree=args.sh)
    rast = RasterizeConfig(tile_px=16, dup_hw=(2, 2), max_per_tile=64,
                           chunk=32, tile_group=4)
    cfg = TrainConfig(
        model=VicaSplatConfig(backbone=backbone, gaussian_adapter=adapter),
        decoder=DecoderSplattingConfig(rasterize=rast),
        optimizer=OptimizerConfig(warm_up_steps=10),
        dtype="bfloat16", remat=True,
    )
    mesh = make_mesh(n)
    B = n
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    params = init_vicasplat(key, cfg.model)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M  (init {time.time()-t0:.1f}s)")
    optimizer = make_optimizer(params, cfg.optimizer)
    opt_state = optimizer.init(params)

    eye = jnp.broadcast_to(jnp.eye(4), (B, T, 4, 4))
    K = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
        (B, T, 3, 3))
    batch = {
        "context": {
            "image": jax.random.uniform(key, (B, T, size, size, 3)),
            "intrinsics": K, "extrinsics": eye,
            "near": jnp.ones((B, T)), "far": jnp.full((B, T), 100.0),
        },
        "target": {
            "image": jax.random.uniform(key, (B, V, size, size, 3)),
            "intrinsics": K[:, :V], "extrinsics": eye[:, :V],
            "near": jnp.ones((B, V)), "far": jnp.full((B, V), 100.0),
        },
    }
    with mesh:
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        batch = shard_batch(mesh, batch)
        step = jax.jit(make_train_step(cfg, optimizer, mesh=mesh),
                       donate_argnums=(0, 1), static_argnums=(4,))
        t0 = time.time()
        lowered = step.lower(params, opt_state, batch, 0, "full")
        print(f"lower: {time.time()-t0:.1f}s")
        t0 = time.time()
        compiled = lowered.compile()
        print(f"compile: {time.time()-t0:.1f}s")
        hlo = compiled.as_text()
        coll = collections.Counter(
            m.group(0) for m in re.finditer(
                r"\b(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)\b",
                hlo))
        print("collectives:", dict(coll))
        # shapes of all-gathers, to see what gets unsharded
        for ln in hlo.splitlines():
            if re.search(r"= \S+ all-gather\(", ln):
                print("  AG:", ln.strip()[:160])
        if args.run:
            t0 = time.time()
            params, opt_state, logs = compiled(params, opt_state, batch, 0)
            loss = float(logs["loss"])
            print(f"step1: {time.time()-t0:.1f}s  loss={loss:.4f} "
                  f"psnr={float(logs['psnr']):.2f}")


if __name__ == "__main__":
    main()
