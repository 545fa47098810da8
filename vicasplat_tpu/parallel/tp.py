"""Tensor parallelism for the VicaNet transformer stacks.

The reference scales only by data parallelism (Lightning DDP); on TPU the
mesh generalizes: a ("data", "model") 2-D mesh shards the batch over "data"
and splits attention heads + MLP hidden units over "model"
(Megatron-style). Only the PARAMETER shardings are annotated — XLA's SPMD
propagation shards the matching activation dimensions and inserts the
all-reduce after each row-parallel projection, riding ICI.

Column-parallel (output dim sharded): qkv, cross-attn q/k/v, mlp fc1.
Row-parallel (input dim sharded, psum after): attn proj, cross proj, fc2.
Everything else (norms, embeddings, heads, modulations) is replicated —
they are <2% of FLOPs.

Constraint: the "model" axis size must divide both head counts
(enc 16, dec 12 -> 2 or 4) and the MLP hidden dims.

Use `use_flash_attention=False` under TP: the einsum attention composes
with SPMD propagation; the Pallas flash kernel would need an explicit
shard_map wrapper.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_data: int, n_model: int,
                 devices: Optional[list] = None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    assert len(devs) >= n_data * n_model
    arr = np.array(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# (param-path suffix, sharded dim counted from the END of the weight's
# shape). Block weights are stacked (L, in, out), so end-relative indexing
# covers both stacked and unstacked leaves:
#   out dim = -1 (column parallel), in dim = -2 (row parallel).
_COL = {-1}
_TP_RULES = [
    # path-suffix fragments -> dim from end to shard over "model"
    (("attn", "qkv", "w"), -1),
    (("attn", "qkv", "b"), -1),
    (("attn", "proj", "w"), -2),
    (("cross_attn", "projq", "w"), -1),
    (("cross_attn", "projq", "b"), -1),
    (("cross_attn", "projk", "w"), -1),
    (("cross_attn", "projk", "b"), -1),
    (("cross_attn", "projv", "w"), -1),
    (("cross_attn", "projv", "b"), -1),
    (("cross_attn", "proj", "w"), -2),
    (("mlp", "fc1", "w"), -1),
    (("mlp", "fc1", "b"), -1),
    (("mlp", "fc2", "w"), -2),
    (("mlp_cam", "fc1", "w"), -1),
    (("mlp_cam", "fc1", "b"), -1),
    (("mlp_cam", "fc2", "w"), -2),
]


def _path_names(path) -> tuple:
    names = []
    for e in path:
        if hasattr(e, "key"):
            names.append(e.key)
        elif hasattr(e, "name"):
            names.append(e.name)
    return tuple(names)


def tp_spec(path, leaf, n_model: int) -> P:
    """PartitionSpec for one backbone param leaf under ("data","model")."""
    names = _path_names(path)
    for suffix, dim in _TP_RULES:
        if names[-len(suffix):] == suffix:
            d = leaf.ndim + dim
            if leaf.shape[d] % n_model == 0:
                spec = [None] * leaf.ndim
                spec[d] = "model"
                return P(*spec)
    return P()


def shard_params_tp(mesh: Mesh, params):
    """Place a VicaSplat/VicaNet param tree on the mesh with TP shardings.

    Head params and non-matching leaves are replicated; the data axis is
    used only for batch/grad sharding (annotated at the train step).
    """
    n_model = mesh.shape["model"]

    def put(path, x):
        return jax.device_put(x, NamedSharding(mesh, tp_spec(path, x, n_model)))

    return jax.tree_util.tree_map_with_path(put, params)
