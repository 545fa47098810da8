"""Expert parallelism for MoE-MLP decoder blocks (models/moe.py).

The reference model family is dense (no MoE anywhere — SURVEY §2.9), so
this is a beyond-reference scaling option: expert-stacked FFN weights
shard over an "expert" mesh axis, each device holds E/n_expert experts,
and GSPMD turns the static one-hot dispatch/combine einsums into
all-to-alls over ICI. Like tp.py/sp.py this is pure GSPMD: parameter
shardings (+ an expert-major activation constraint inside moe_mlp) — the
math stays the single-device code.

The expert axis of a leaf under an "experts" subtree is end-relative:
weights are (..., E, d_in, d_out) -> axis ndim-3, biases (..., E, d_out)
-> axis ndim-2; the leading block-stack axis (L, E, ...) that lax.scan
slices per layer passes through, exactly like parallel/tp.py's rules.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_ep(n_data: int, n_expert: int,
                 devices: Optional[list] = None) -> Mesh:
    """A ("data", "expert") mesh: batch over "data", experts over
    "expert"."""
    devs = devices if devices is not None else jax.devices()
    assert len(devs) >= n_data * n_expert
    arr = np.array(devs[: n_data * n_expert]).reshape(n_data, n_expert)
    return Mesh(arr, ("data", "expert"))


def _expert_axis(path_names, leaf) -> Optional[int]:
    if "experts" not in path_names:
        return None
    # {"fc1"/"fc2": {"w": (..., E, d_in, d_out), "b": (..., E, d_out)}}
    return leaf.ndim - 3 if path_names[-1] == "w" else leaf.ndim - 2


def shard_params_ep(mesh: Mesh, params):
    """Shard every leaf under an "experts" subtree along its expert axis
    over "expert"; everything else (router included) replicates."""
    n_e = mesh.shape["expert"]

    def put(path, x):
        names = tuple(
            k.key if hasattr(k, "key") else str(k) for k in path
        )
        ax = _expert_axis(names, x)
        if ax is None or x.shape[ax] % n_e != 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = [None] * x.ndim
        spec[ax] = "expert"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map_with_path(put, params)
