"""Device mesh + sharding helpers.

The reference distributes by Lightning DDP over NCCL (reference:
src/main.py:104-124) — pure data parallelism. The TPU-native equivalent is a
1-D ("data",) jax.sharding.Mesh over ICI: the batch axis is sharded, params
are replicated (optionally FSDP-sharded over the same axis), and XLA inserts
the gradient psum. Multi-host extends the same mesh over DCN via
jax.distributed.initialize — same program, bigger mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Shard every leaf of a batch pytree along its leading (batch) axis."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_params_fsdp(mesh: Mesh, tree, axis_name: str = "data",
                      min_size: int = 2**16):
    """FSDP-style parameter sharding: each large leaf is sharded along its
    largest divisible dimension over the data axis; XLA all-gathers weights
    at use and reduce-scatters gradients. Small leaves stay replicated.

    The reference has no model-state sharding (pure DDP); this is the
    TPU-native upgrade for fitting larger models / optimizer states.
    """
    n = mesh.devices.size

    def put(x):
        if x.ndim == 0 or x.size < min_size:
            return jax.device_put(x, NamedSharding(mesh, P()))
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % n == 0:
                spec = [None] * x.ndim
                spec[d] = axis_name
                return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host bring-up over DCN (the reference's `num_nodes` Lightning
    plumbing, src/main.py:106). Same SPMD program, bigger mesh."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
