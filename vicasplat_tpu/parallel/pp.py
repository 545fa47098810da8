"""Pipeline parallelism (GPipe schedule) over stacked transformer blocks.

The reference scales only by data parallelism (Lightning DDP,
reference src/main.py:104-124); this is the TPU-native pipeline upgrade
for models whose *depth* outgrows one chip. The VicaNet stacks are already
stored as stacked pytrees with a leading block axis (models/vicanet.py
scans them with lax.scan), so pipelining falls out naturally:

- the leading block axis is sharded over a "pipe" mesh axis — stage ``s``
  holds ``L/S`` consecutive blocks in its HBM (the whole point: per-device
  parameter memory drops by ``S``);
- the batch is split into ``M`` microbatches; at schedule step ``t`` stage
  ``s`` runs microbatch ``t - s`` through its local blocks (an inner
  lax.scan), then hands the activation to stage ``s+1`` with a single
  ``ppermute`` hop — nearest-neighbor traffic that rides ICI;
- every stage computes at every step (SPMD requires it); steps where
  ``t - s`` is outside ``[0, M)`` are pipeline bubbles whose outputs are
  masked out. Bubble fraction is ``(S-1)/(M+S-1)`` — raise ``n_micro``
  to amortize.

The whole schedule is two nested ``lax.scan``s inside one ``shard_map``:
traced once, no data-dependent control flow, differentiable end-to-end
(``ppermute``'s transpose is the reverse permute, so the backward pass is
the mirror-image pipeline — standard GPipe).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_pipe(n_stages: Optional[int] = None,
                   axis_name: str = "pipe") -> Mesh:
    devs = jax.devices()
    if n_stages is not None:
        devs = devs[:n_stages]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_pipe_data(n_stages: int, n_data: int,
                        axis_names: tuple = ("pipe", "data")) -> Mesh:
    """2-D mesh composing pipeline stages with data parallelism: each
    stage's blocks replicate over the data axis, each microbatch's batch
    dim shards over it."""
    devs = np.array(jax.devices()[: n_stages * n_data])
    return Mesh(devs.reshape(n_stages, n_data), axis_names)


def shard_params_pp(mesh: Mesh, stacked, axis_name: str = "pipe"):
    """Shard every leaf of a stacked-block pytree along its leading (block)
    axis over the pipe axis: stage s materializes only its L/S blocks."""
    n = mesh.shape[axis_name]

    def put(x):
        assert x.shape[0] % n == 0, (
            f"block axis {x.shape[0]} not divisible by {n} pipeline stages"
        )
        return jax.device_put(
            x, NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1))))
        )

    return jax.tree.map(put, stacked)


def pipeline_scan(
    block_fn: Callable,
    stacked_params,
    x: jnp.ndarray,
    mesh: Mesh,
    *,
    axis_name: str = "pipe",
    n_micro: Optional[int] = None,
    data_axis: Optional[str] = None,
):
    """Run ``x`` through all L stacked blocks, pipelined over the mesh.

    Equivalent to ``lax.scan(lambda h, blk: (block_fn(h, blk), None), x,
    stacked_params)[0]`` — but with the block axis sharded over
    ``axis_name`` and microbatches flowing stage-to-stage via ppermute.

    block_fn: (activation, one-block params) -> activation, shape-preserving.
    x: (B, ...) activations; B must be divisible by n_micro.
    n_micro: microbatch count M (default: the stage count S).
    data_axis: on a 2-D mesh (make_mesh_pipe_data), additionally shard the
      within-microbatch batch dim over this axis — pipeline x data
      parallelism; blocks replicate over it.
    """
    S = mesh.shape[axis_name]
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    assert L % S == 0, f"{L} blocks not divisible by {S} stages"
    M = int(n_micro) if n_micro is not None else S
    B = x.shape[0]
    assert B % M == 0, f"batch {B} not divisible by {M} microbatches"
    if data_axis is not None:
        D = mesh.shape[data_axis]
        assert (B // M) % D == 0, (
            f"microbatch {B // M} not divisible by data axis {D}"
        )
    xm = x.reshape(M, B // M, *x.shape[1:])
    fwd = [(i, i + 1) for i in range(S - 1)]

    def stage_fn(blocks, xm):
        # blocks: (L/S, ...) stage-local; xm: (M, mb, ...) replicated
        s = jax.lax.axis_index(axis_name)

        def run_local(h):
            def body(h, blk):
                return block_fn(h, blk), None

            return jax.lax.scan(body, h, blocks)[0]

        def sched_step(carry, t):
            act_in, out = carry
            # stage 0 ingests microbatch t; later stages take the ppermute'd
            # activation from stage s-1
            x_t = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            h = jnp.where(s == 0, x_t, act_in)
            h = run_local(h)
            # the last stage finishes microbatch m = t - (S-1)
            m = t - (S - 1)
            mc = jnp.clip(m, 0, M - 1)
            done = (s == S - 1) & (m >= 0) & (m < M)
            prev = jax.lax.dynamic_index_in_dim(out, mc, 0, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(done, h, prev), mc, 0
            )
            # hand the activation to the next stage (stage 0 receives zeros,
            # which it never reads)
            act_next = jax.lax.ppermute(h, axis_name, fwd)
            return (act_next, out), None

        act0 = jnp.zeros(xm.shape[1:], xm.dtype)
        out0 = jnp.zeros_like(xm)
        (_, out), _ = jax.lax.scan(
            sched_step, (act0, out0), jnp.arange(M + S - 1)
        )
        # out is only valid on the last stage; expose a per-stage leading
        # axis so the caller slices stage S-1 (avoids a full-output psum)
        return out[None]

    spec_blocks = jax.tree.map(
        lambda l: P(axis_name, *([None] * (l.ndim - 1))), stacked_params
    )
    spec_x = P(None, data_axis) if data_axis is not None else P()
    out = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(spec_blocks, spec_x),
        out_specs=P(axis_name, None, data_axis)
        if data_axis is not None else P(axis_name),
        check_rep=False,
    )(stacked_params, xm)
    return out[-1].reshape(B, *x.shape[1:])
