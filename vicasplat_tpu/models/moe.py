"""Mixture-of-experts MLP (top-k routing) with expert parallelism.

Beyond-reference: the VicaSplat family is dense everywhere (the reference
decoder MLP is a plain 2-layer GELU net, reference
src/model/encoder/backbone/backbone_vica.py:263-335) — this is the
TPU-production option for growing the mix-decoder's parameter count without
growing per-token FLOPs, and it completes the parallelism surface with
expert parallelism: expert-stacked weights shard over an "expert" mesh
axis and GSPMD routes tokens device-to-device (all-to-all over ICI).

TPU-native design: GShard-style STATIC-shape dispatch. No dynamic gathers —
routing is expressed as one-hot dispatch/combine tensors contracted with
MXU einsums, so the whole thing jits with fixed shapes:

    dispatch (S, E, cap): token s occupies slot c of expert e
    expert_in = einsum('sec,sd->ecd', dispatch, x)       # a2a under EP
    h         = gelu(einsum('ecd,edh->ech', ., fc1))     # expert-local MXU
    out       = einsum('ech,ehd->ecd', h, fc2)
    y         = einsum('sec,ecd->sd', combine, out)      # a2a back

Tokens beyond an expert's capacity (cap = ceil(top_k*S/E * capacity_factor))
are dropped for that expert (standard switch behavior); with top_k routes a
token survives unless all its experts overflow. Priority is route-major:
every token's primary choice is seated before any secondary choice.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .layers import linear, linear_init, mlp_init


def moe_init(key, dim: int, hidden: int, n_experts: int):
    """Router (dim -> E, no bias, f32 routing) + E i.i.d. experts stacked on
    a leading axis: fc1 (E, dim, hidden), fc2 (E, hidden, dim)."""
    k_r, k_e = jax.random.split(key)
    ks = jax.random.split(k_e, n_experts)
    experts = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[mlp_init(k, dim, hidden) for k in ks]
    )
    return {
        "router": linear_init(k_r, dim, n_experts, bias=False),
        "experts": experts,
    }


def _dispatch_combine(probs, top_k: int, cap: int):
    """(S, E) router probs -> dispatch (S, E, cap) {0,1} and combine
    (S, E, cap) gate weights, route-major capacity priority."""
    S, E = probs.shape
    # top-k expert ids per token, gates renormalized over the kept routes
    gate_k, idx_k = jax.lax.top_k(probs, top_k)            # (S, K)
    gate_k = gate_k / jnp.maximum(gate_k.sum(-1, keepdims=True), 1e-9)
    # route-major flattening: all k=0 choices first, then k=1, ...
    e_flat = idx_k.T.reshape(-1)                           # (K*S,)
    g_flat = gate_k.T.reshape(-1)
    onehot = jax.nn.one_hot(e_flat, E, dtype=jnp.float32)  # (K*S, E)
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0        # slot per expert
    pos_e = pos.max(axis=-1)                               # (K*S,)
    keep = (pos_e >= 0.0) & (pos_e < cap)
    slot = jax.nn.one_hot(
        jnp.clip(pos_e, 0, cap - 1).astype(jnp.int32), cap,
        dtype=jnp.float32,
    )                                                      # (K*S, cap)
    disp = (onehot * keep[:, None])[:, :, None] * slot[:, None, :]
    comb = disp * g_flat[:, None, None]
    # back to token-major and sum the K routes per token
    disp = disp.reshape(top_k, S, E, cap).sum(0)
    comb = comb.reshape(top_k, S, E, cap).sum(0)
    return disp, comb


def moe_mlp(p, x, *, top_k: int = 1, capacity_factor: float = 1.25,
            dtype=None, ep_mesh=None, return_aux: bool = False):
    """Drop-in for layers.mlp on a moe_init'd param dict. x: (..., C).

    ep_mesh: a mesh with an "expert" axis (parallel/ep.make_mesh_ep) —
    expert-major activations get an experts-over-"expert" sharding
    constraint so the expert FFNs run expert-local and GSPMD inserts the
    dispatch/combine all-to-alls. Params must be sharded with
    parallel/ep.shard_params_ep.

    return_aux: also return the switch-style load-balance loss
    E * sum_e(token_frac_e * mean_prob_e) (=1 at perfect balance).
    """
    C = x.shape[-1]
    xt = x.reshape(-1, C)
    S = xt.shape[0]
    E = p["router"]["w"].shape[-1]
    # route in f32: tiny matmul, and gate ordering is accuracy-critical
    logits = linear(p["router"], xt, jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    cap = min(S, max(1, int(math.ceil(top_k * S / E * capacity_factor))))
    disp, comb = _dispatch_combine(probs, top_k, cap)

    cdt = dtype or x.dtype
    ex = p["experts"]

    def constrain(t):
        if ep_mesh is None:
            return t
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P("expert", *([None] * (t.ndim - 1)))
        return jax.lax.with_sharding_constraint(t, NamedSharding(ep_mesh, spec))

    expert_in = constrain(
        jnp.einsum("sec,sd->ecd", disp.astype(cdt), xt.astype(cdt))
    )
    h = jnp.einsum("ecd,edh->ech", expert_in, ex["fc1"]["w"].astype(cdt))
    h = jax.nn.gelu(h + ex["fc1"]["b"].astype(cdt)[:, None, :],
                    approximate=False)
    out_e = jnp.einsum("ech,ehd->ecd", h, ex["fc2"]["w"].astype(cdt))
    out_e = constrain(out_e + ex["fc2"]["b"].astype(cdt)[:, None, :])
    y = jnp.einsum("sec,ecd->sd", comb.astype(cdt), out_e)
    y = y.reshape(x.shape).astype(x.dtype if dtype is None else cdt)
    if not return_aux:
        return y
    # switch-transformer load-balance loss on the PRIMARY route
    primary = jax.nn.one_hot(jnp.argmax(probs, -1), E, dtype=jnp.float32)
    aux = E * jnp.sum(primary.mean(0) * probs.mean(0))
    return y, aux
