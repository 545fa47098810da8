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
