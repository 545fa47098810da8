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

Carries may be arbitrary pytrees (the VicaNet decoder carries (img, cam)),
and ``collect_outputs=True`` additionally returns every block's per-block
output (the decoder's DPT hook activations) reassembled in serial order.
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
    x,
    mesh: Mesh,
    *,
    axis_name: str = "pipe",
    n_micro: Optional[int] = None,
    data_axis: Optional[str] = None,
    collect_outputs: bool = False,
):
    """Run ``x`` through all L stacked blocks, pipelined over the mesh.

    Equivalent to ``lax.scan(block_fn, x, stacked_params)`` — with the
    block axis sharded over ``axis_name`` and microbatches flowing
    stage-to-stage via ppermute.

    block_fn: (carry, one-block params) -> carry, or -> (carry, y) when
      ``collect_outputs`` — carry is any pytree whose leaves all lead with
      the batch dim B; per-block outputs y must also lead with B.
    x: carry pytree, leaves (B, ...); B must be divisible by n_micro.
    n_micro: microbatch count M (default: the stage count S).
    data_axis: on a 2-D mesh (make_mesh_pipe_data), additionally shard the
      within-microbatch batch dim over this axis — pipeline x data
      parallelism; blocks replicate over it.
    collect_outputs: also return the stacked per-block outputs in serial
      block order — leaves (L, B, ...) — e.g. the decoder's DPT hooks.

    Returns the final carry (leaves (B, ...)), or (carry, per_block_ys).
    """
    S = mesh.shape[axis_name]
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    assert L % S == 0, f"{L} blocks not divisible by {S} stages"
    Ls = L // S
    M = int(n_micro) if n_micro is not None else S
    B = jax.tree.leaves(x)[0].shape[0]
    assert B % M == 0, f"batch {B} not divisible by {M} microbatches"
    if data_axis is not None:
        D = mesh.shape[data_axis]
        assert (B // M) % D == 0, (
            f"microbatch {B // M} not divisible by data axis {D}"
        )
    xm = jax.tree.map(
        lambda l: l.reshape(M, B // M, *l.shape[1:]), x
    )
    fwd = [(i, i + 1) for i in range(S - 1)]

    def _index(tree, i):
        return jax.tree.map(
            lambda l: jax.lax.dynamic_index_in_dim(l, i, 0, keepdims=False),
            tree,
        )

    def _update(tree, upd, i):
        return jax.tree.map(
            lambda l, u: jax.lax.dynamic_update_index_in_dim(l, u, i, 0),
            tree, upd,
        )

    def _select(pred, a, b):
        return jax.tree.map(lambda u, v: jnp.where(pred, u, v), a, b)

    def stage_fn(blocks, xm):
        # blocks: (L/S, ...) stage-local; xm leaves: (M, mb, ...)
        s = jax.lax.axis_index(axis_name)

        def run_local(h):
            def body(h, blk):
                r = block_fn(h, blk)
                return r if collect_outputs else (r, None)

            return jax.lax.scan(body, h, blocks)

        carry0 = jax.tree.map(lambda l: jnp.zeros(l.shape[1:], l.dtype), xm)
        if collect_outputs:
            one = jax.tree.map(lambda l: l[0], blocks)
            _, y_sd = jax.eval_shape(block_fn, carry0, one)
            yb0 = jax.tree.map(
                lambda sd: jnp.zeros((M, Ls) + sd.shape, sd.dtype), y_sd
            )
        else:
            yb0 = None

        def sched_step(carry, t):
            act_in, out, yb = carry
            # stage 0 ingests microbatch t; later stages take the
            # ppermute'd activation from stage s-1
            x_t = _index(xm, jnp.clip(t, 0, M - 1))
            h = _select(s == 0, x_t, act_in)
            h, ys = run_local(h)
            # this stage computes microbatch m_here = t - s
            m_here = t - s
            if collect_outputs:
                mh = jnp.clip(m_here, 0, M - 1)
                ok = (m_here >= 0) & (m_here < M)
                prev_y = _index(yb, mh)
                yb = _update(yb, _select(ok, ys, prev_y), mh)
            # the last stage finishes microbatch m = t - (S-1)
            m = t - (S - 1)
            mc = jnp.clip(m, 0, M - 1)
            done = (s == S - 1) & (m >= 0) & (m < M)
            out = _update(out, _select(done, h, _index(out, mc)), mc)
            # hand the activation to the next stage (stage 0 receives
            # zeros, which it never reads)
            act_next = jax.lax.ppermute(h, axis_name, fwd)
            return (act_next, out, yb), None

        out0 = jax.tree.map(jnp.zeros_like, xm)
        (_, out, yb), _ = jax.lax.scan(
            sched_step, (carry0, out0, yb0), jnp.arange(M + S - 1)
        )
        # final carry is only valid on the last stage; expose a per-stage
        # leading axis so the caller slices stage S-1 (avoids a psum).
        # per-block outputs are valid on EVERY stage for its own blocks.
        lead = jax.tree.map(lambda l: l[None], out)
        if collect_outputs:
            return lead, jax.tree.map(lambda l: l[None], yb)
        return lead

    spec_blocks = jax.tree.map(
        lambda l: P(axis_name, *([None] * (l.ndim - 1))), stacked_params
    )
    da = data_axis
    spec_x = jax.tree.map(lambda _: P(None, da) if da else P(), xm)
    spec_out = jax.tree.map(
        lambda _: P(axis_name, None, da) if da else P(axis_name), xm
    )
    if collect_outputs:
        # ys leaves stack as (S, M, Ls, mb, ...)
        out_specs = (
            spec_out,
            P(axis_name, None, None, da) if da else P(axis_name),
        )
    else:
        out_specs = spec_out
    res = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(spec_blocks, spec_x),
        out_specs=out_specs,
        check_rep=False,
    )(stacked_params, xm)

    def _final(tree):
        return jax.tree.map(
            lambda l: l[-1].reshape(B, *l.shape[3:]), tree
        )

    if collect_outputs:
        out, ys = res
        # (S, M, Ls, mb, ...) -> (S, Ls, M, mb, ...) -> (L, B, ...)
        ys = jax.tree.map(
            lambda l: l.transpose(0, 2, 1, *range(3, l.ndim)).reshape(
                L, B, *l.shape[4:]
            ),
            ys,
        )
        return _final(out), ys
    return _final(res)
