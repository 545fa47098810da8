"""Sequence parallelism (SP) over the token axis of the VicaNet stacks.

The reference has nothing comparable — its attention runs on one GPU over at
most T*(N+1) = 2056 tokens (reference src/model/encoder/backbone/
backbone_vica.py:110-121). On TPU the mesh generalizes: a ("data", "seq")
2-D mesh shards the batch over "data" and the PATCH-TOKEN axis over "seq"
(Megatron-style sequence parallelism). LayerNorm / MLP / RoPE / elementwise
work then runs on N/n_seq tokens per device, and XLA's SPMD partitioner
inserts the K/V all-gather around each attention contraction, riding ICI.
At 256px a frame is 257 tokens and SP is pointless; at 512px+ (1024 patch
tokens per frame, 8k+ joint-attention tokens for 8 frames) the per-device
activation shards are what make the decoder fit.

Design: only activation sharding CONSTRAINTS are annotated, at block
boundaries inside `models/vicanet.vicanet_forward(sp_mesh=...)` — the block
math stays the single-device code, GSPMD propagates the layout through it
(same philosophy as parallel/tp.py, which constrains only params). Camera
tokens (B, T, C) stay replicated over "seq": T <= 8 rows of C floats are
not worth a collective.

Composition: the "data" axis still shards the batch, so SP composes with
data parallelism on the same mesh ((n_data, n_seq) devices). Not composable
with the pipeline scan (both re-layout the block loop); vicanet_forward
asserts that. Use `use_flash_attention=False` under SP (enforced by
vicanet_forward): the einsum attention composes with SPMD propagation; the
Pallas flash kernel would need an explicit shard_map wrapper.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_sp(n_data: int, n_seq: int,
                 devices: Optional[list] = None) -> Mesh:
    """A ("data", "seq") mesh: batch sharded over "data", patch tokens over
    "seq"."""
    devs = devices if devices is not None else jax.devices()
    assert len(devs) >= n_data * n_seq
    arr = np.array(devs[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(arr, ("data", "seq"))


def sp_shard_tokens(x, mesh: Optional[Mesh], token_axis: int = -2):
    """Constrain activation `x` to (batch over "data", tokens over "seq").

    x's leading axis is the (possibly frame-folded) batch; `token_axis` is
    the patch-token axis (default -2: (..., N, C) layouts). No-op when mesh
    is None so call sites stay unconditional.
    """
    if mesh is None:
        return x
    spec = [None] * x.ndim
    spec[0] = "data"
    spec[token_axis % x.ndim] = "seq"
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def sp_shard_batch_only(x, mesh: Optional[Mesh]):
    """Constrain a token-free activation (e.g. camera tokens (B, T, C)) to
    batch-over-"data", replicated over "seq"."""
    if mesh is None:
        return x
    spec = [None] * x.ndim
    spec[0] = "data"
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
