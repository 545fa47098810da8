"""Flagship-scale multi-chip memory proof (compile-only).

AOT-lowers the FULL 578M-param flagship train step (8 ctx / 4 tgt at 256²,
bf16 + dots remat, donated buffers — the production re10k_8view recipe)
over virtual device meshes and records XLA's per-device memory assignment
(`compiled.memory_analysis()`): the evidence that the sharded memory math
actually closes on 16 GB v5e chips, without needing N real chips.

Configs:
  - dp8:     8-way data parallelism (batch 8, one example per device,
             params/opt replicated — the reference's only scaling mode,
             reference src/main.py:104-124, Lightning DDP).
  - pp4xdp2: 4 pipeline stages x 2-way data (parallel/pp.py GPipe over the
             stacked enc/dec blocks — stage-local block shards cut
             per-device param+opt memory; beyond-reference).

Run: python -m vicasplat_tpu.parallel.memory_proof
(on any host; uses a virtual CPU mesh). Results land in
outputs/multichip_memory/flagship_memory.json and are summarized by
`__graft_entry__.dryrun_multichip`.

Everything is abstract (jax.eval_shape / ShapeDtypeStruct lowering): no
578M arrays are materialized — only XLA's compile + buffer assignment run.
"""
from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

HBM_BYTES = 16 * 1024**3  # v5e


def _ensure_devices(n: int) -> None:
    if len(jax.devices()) < n:
        try:
            from jax.extend import backend as _jax_backend

            _jax_backend.clear_backends()
        except Exception:
            pass
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n)
        assert len(jax.devices()) >= n


def _flagship_train_setup():
    from ..decoder.splatting import DecoderSplattingConfig
    from ..models import (
        GaussianAdapterConfig,
        VicaNetConfig,
        VicaSplatConfig,
        init_vicasplat,
    )
    from ..training import OptimizerConfig, TrainConfig
    from ..training.optimizer import make_optimizer

    cfg = TrainConfig(
        model=VicaSplatConfig(
            backbone=VicaNetConfig(),  # ViT-L/16 enc 24x1024, dec 12x768
            gaussian_adapter=GaussianAdapterConfig(sh_degree=4),
        ),
        decoder=DecoderSplattingConfig(),
        optimizer=OptimizerConfig(),
        dtype="bfloat16",
        remat=True,
        remat_policy="dots",
    )
    p_sds = jax.eval_shape(
        lambda k: init_vicasplat(k, cfg.model), jax.random.PRNGKey(0)
    )
    # make_optimizer only inspects tree structure/paths; init is abstract
    optimizer = make_optimizer(p_sds, cfg.optimizer)
    o_sds = jax.eval_shape(optimizer.init, p_sds)
    return cfg, optimizer, p_sds, o_sds


def _batch_sds(B, T, V, size):
    def views(n):
        return {
            "image": jax.ShapeDtypeStruct((B, n, size, size, 3), jnp.float32),
            "intrinsics": jax.ShapeDtypeStruct((B, n, 3, 3), jnp.float32),
            "extrinsics": jax.ShapeDtypeStruct((B, n, 4, 4), jnp.float32),
            "near": jax.ShapeDtypeStruct((B, n), jnp.float32),
            "far": jax.ShapeDtypeStruct((B, n), jnp.float32),
        }

    return {"context": views(T), "target": views(V)}


def _with_shardings(sds_tree, mesh, pipe_axis=None, fsdp_axis=None):
    """Attach NamedShardings: stacked-block leaves (path contains
    enc_blocks/dec_blocks — params AND their adam moments) shard their
    leading block axis over `pipe_axis`; with `fsdp_axis`, every large leaf
    shards its largest divisible dim over that axis (mirrors
    mesh.shard_params_fsdp); everything else replicates."""
    n_pipe = mesh.shape.get(pipe_axis, 1) if pipe_axis else 1
    n_fsdp = mesh.shape.get(fsdp_axis, 1) if fsdp_axis else 1

    def put(path, sd):
        spec = P()
        if pipe_axis is not None:
            names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
            if any(n in ("enc_blocks", "dec_blocks") for n in names):
                if sd.ndim >= 1 and sd.shape[0] % n_pipe == 0:
                    spec = P(pipe_axis, *([None] * (sd.ndim - 1)))
        if fsdp_axis is not None and sd.ndim >= 1 and sd.size >= 2**16:
            for d in sorted(range(sd.ndim), key=lambda d: -sd.shape[d]):
                if sd.shape[d] % n_fsdp == 0:
                    fspec = [None] * sd.ndim
                    fspec[d] = fsdp_axis
                    spec = P(*fspec)
                    break
        return jax.ShapeDtypeStruct(
            sd.shape, sd.dtype, sharding=NamedSharding(mesh, spec)
        )

    return jax.tree_util.tree_map_with_path(put, sds_tree)


def _batch_with_shardings(b_sds, mesh, data_axis="data"):
    def put(sd):
        spec = P(data_axis, *([None] * (sd.ndim - 1)))
        return jax.ShapeDtypeStruct(
            sd.shape, sd.dtype, sharding=NamedSharding(mesh, spec)
        )

    return jax.tree.map(put, b_sds)


def flagship_memory_proof(
    out_path: str = "outputs/multichip_memory/flagship_memory.json",
    configs=("dp8", "fsdp8", "pp4xdp2"),
    n_devices: int = 8,
):
    from ..training import make_train_step
    from .pp import make_mesh_pipe_data

    _ensure_devices(n_devices)
    cfg, optimizer, p_sds, o_sds = _flagship_train_setup()
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(p_sds))
    size, T, V = 256, 8, 4
    report = {"params_m": round(n_params / 1e6, 1), "hbm_bytes": HBM_BYTES,
              "image": size, "ctx": T, "tgt": V,
              "note": "per-device bytes from compiled.memory_analysis() of "
                      "the donated full train step, AOT on a virtual mesh. "
                      "XLA:CPU buffer assignment is a CONSERVATIVE proxy "
                      "for the TPU compiler's: the dp8 per-device workload "
                      "(B=1 local, donated, dots remat) empirically runs "
                      "on a real 16G v5e at 261 ms/step (tools/jobs/015), "
                      "so dp8's >16G estimate is backend overcount, not an "
                      "OOM prediction; fsdp8/pp4xdp2 shard the state and "
                      "fit even under this conservative accounting.",
              "configs": {}}

    for name in configs:
        fsdp_axis = None
        if name == "dp8":
            mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
            pipe_axis, B = None, 8
            step = make_train_step(cfg, optimizer, mesh=mesh)
        elif name == "fsdp8":
            # DP-8 with params+opt ZeRO/FSDP-sharded over the data axis
            # (mesh.shard_params_fsdp): cuts the replicated-state overhang
            mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
            pipe_axis, fsdp_axis, B = None, "data", 8
            step = make_train_step(cfg, optimizer, mesh=mesh)
        elif name == "pp4xdp2":
            mesh = make_mesh_pipe_data(4, 2)
            pipe_axis, B = "pipe", 2
            step = make_train_step(cfg, optimizer, mesh=mesh,
                                   pipeline_mesh=mesh)
        else:
            raise ValueError(name)
        p_in = _with_shardings(p_sds, mesh, pipe_axis, fsdp_axis)
        o_in = _with_shardings(o_sds, mesh, pipe_axis, fsdp_axis)
        b_in = _batch_with_shardings(_batch_sds(B, T, V, size), mesh)
        with mesh:
            lowered = jax.jit(
                step, donate_argnums=(0, 1), static_argnums=(4,)
            ).lower(p_in, o_in, b_in, 0, "full")
            compiled = lowered.compile()
        ma = compiled.memory_analysis()
        row = {
            "mesh": dict(mesh.shape),
            "batch": B,
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "alias_bytes": int(ma.alias_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
        }
        # donated params+opt alias their outputs: live peak per device =
        # arguments + temps + (outputs - aliased)
        peak = (row["argument_bytes"] + row["temp_bytes"]
                + row["output_bytes"] - row["alias_bytes"])
        row["peak_bytes_est"] = int(peak)
        row["peak_gib"] = round(peak / 1024**3, 2)
        row["fits_16g"] = bool(peak < HBM_BYTES)
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            row["flops_per_step"] = float(ca.get("flops", 0.0))
        except Exception:
            pass
        report["configs"][name] = row
        print(f"memory_proof {name}: mesh={row['mesh']} B={B} "
              f"arg={row['argument_bytes']/1024**3:.2f}G "
              f"temp={row['temp_bytes']/1024**3:.2f}G "
              f"peak~{row['peak_gib']}G fits_16g={row['fits_16g']}",
              flush=True)
        del compiled, lowered

    out = pathlib.Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}")
    return report


if __name__ == "__main__":
    flagship_memory_proof()
