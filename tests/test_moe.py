"""MoE decoder MLP (models/moe.py) + expert parallelism (parallel/ep.py).

The reference model family is dense; the MoE FFN is a beyond-reference
scaling option, so the correctness bar is: (a) with identical experts the
routed FFN must equal the dense MLP exactly (routing only selects, never
alters, the math), (b) EP sharding must not change the numbers, (c) the
full backbone runs and differentiates with MoE blocks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vicasplat_tpu.models.layers import mlp, mlp_init
from vicasplat_tpu.models.moe import moe_init, moe_mlp


def _identical_expert_params(key, dim, hidden, n_experts):
    """MoE params whose E experts are all copies of one dense MLP."""
    p = moe_init(key, dim, hidden, n_experts)
    dense = mlp_init(jax.random.PRNGKey(7), dim, hidden)
    p["experts"] = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_experts,) + x.shape), dense
    )
    return p, dense


class TestMoeMlp:
    def test_identical_experts_match_dense_top1(self):
        dim, hidden, E = 16, 32, 4
        p, dense = _identical_expert_params(jax.random.PRNGKey(0), dim, hidden, E)
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 5, dim))
        # ample capacity: no token can be dropped
        y = moe_mlp(p, x, top_k=1, capacity_factor=float(E))
        ref = mlp(dense, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_identical_experts_match_dense_top2(self):
        dim, hidden, E = 16, 32, 4
        p, dense = _identical_expert_params(jax.random.PRNGKey(0), dim, hidden, E)
        x = jax.random.normal(jax.random.PRNGKey(2), (10, dim))
        # gates renormalize over the kept routes, so two identical experts
        # still sum to exactly one dense MLP application
        y = moe_mlp(p, x, top_k=2, capacity_factor=float(E))
        ref = mlp(dense, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_capacity_overflow_drops_tokens(self):
        dim, hidden, E = 8, 16, 2
        p, _ = _identical_expert_params(jax.random.PRNGKey(0), dim, hidden, E)
        # router strongly prefers expert 0 for every token
        p["router"]["w"] = jnp.zeros((dim, E)).at[:, 0].set(1.0)
        x = jnp.ones((8, dim))
        # cap = ceil(1*8/2 * 0.5) = 2 -> 6 of 8 tokens overflow expert 0
        y = moe_mlp(p, x, top_k=1, capacity_factor=0.5)
        assert np.isfinite(np.asarray(y)).all()
        zero_rows = np.sum(np.abs(np.asarray(y)).sum(-1) < 1e-12)
        assert zero_rows == 6

    def test_route_major_priority(self):
        # every token's PRIMARY route is seated before ANY secondary route.
        # Two tokens with opposite expert preferences and capacity 1: both
        # primaries seat (their experts differ), both secondaries overflow.
        # Token-major seating would instead give token 0 both seats and
        # token 1 nothing.
        dim, hidden, E = 8, 16, 2
        p, _ = _identical_expert_params(jax.random.PRNGKey(0), dim, hidden, E)
        p["router"]["w"] = jnp.stack(
            [jnp.ones(dim), -jnp.ones(dim)], axis=-1)
        x = jnp.stack([jnp.ones(dim), -jnp.ones(dim)])  # prefers e0 / e1
        y = moe_mlp(p, x, top_k=2, capacity_factor=0.5)  # cap = 1
        assert (np.abs(np.asarray(y)).sum(-1) > 1e-6).all()

    def test_aux_loss_is_one_at_perfect_balance(self):
        dim, hidden, E = 8, 16, 4
        p, _ = _identical_expert_params(jax.random.PRNGKey(0), dim, hidden, E)
        p["router"]["w"] = jnp.zeros((dim, E))  # uniform routing probs
        x = jax.random.normal(jax.random.PRNGKey(3), (16, dim))
        _, aux = moe_mlp(p, x, return_aux=True)
        assert float(aux) == pytest.approx(1.0, abs=1e-5)

    def test_grads_flow_to_router_and_experts(self):
        dim, hidden, E = 8, 16, 2
        p = moe_init(jax.random.PRNGKey(0), dim, hidden, E)
        x = jax.random.normal(jax.random.PRNGKey(1), (6, dim))

        def loss(p):
            y, aux = moe_mlp(p, x, top_k=2, return_aux=True)
            return (y ** 2).mean() + 0.01 * aux

        g = jax.grad(loss)(p)
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
        assert np.abs(np.asarray(g["router"]["w"])).max() > 0
        assert np.abs(np.asarray(g["experts"]["fc1"]["w"])).max() > 0


class TestExpertParallel:
    def test_ep_sharded_matches_unsharded(self):
        from vicasplat_tpu.parallel import make_mesh_ep, shard_params_ep

        dim, hidden, E = 16, 32, 4
        p = moe_init(jax.random.PRNGKey(0), dim, hidden, E)
        x = jax.random.normal(jax.random.PRNGKey(1), (24, dim))
        ref = jax.jit(lambda p: moe_mlp(p, x, top_k=2))(p)

        mesh = make_mesh_ep(2, 4)
        sp = shard_params_ep(mesh, p)
        w = sp["experts"]["fc1"]["w"]  # (E, dim, hidden) over "expert"
        assert w.addressable_shards[0].data.shape[0] == E // 4
        assert sp["router"]["w"].sharding.is_fully_replicated
        got = jax.jit(lambda p: moe_mlp(p, x, top_k=2, ep_mesh=mesh))(sp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


class TestMoeBackbone:
    def _cfg(self):
        from vicasplat_tpu.models.vicanet import VicaNetConfig

        return VicaNetConfig(
            img_size=32, patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=4, dec_embed_dim=48, dec_depth=2, dec_num_heads=4,
            use_flash_attention=False, moe_experts=4, moe_top_k=2,
        )

    def test_forward_and_aux(self):
        from vicasplat_tpu.models.vicanet import init_vicanet, vicanet_forward

        cfg = self._cfg()
        params = init_vicanet(jax.random.PRNGKey(0), cfg)
        # stacked MoE leaves: (L, E, d, hidden)
        assert params["dec_blocks"]["mlp"]["experts"]["fc1"]["w"].shape[:2] \
            == (2, 4)
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 3))
        K = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3))
        out, cam_e, cam_i, inter, aux = jax.jit(
            lambda p: vicanet_forward(p, cfg, imgs, K, dtype=jnp.float32,
                                      return_moe_aux=True)
        )(params)
        assert np.isfinite(np.asarray(out)).all()
        assert np.isfinite(float(aux)) and float(aux) > 0.0

    def test_grads_with_ep_mesh(self):
        from vicasplat_tpu.models.vicanet import init_vicanet, vicanet_forward
        from vicasplat_tpu.parallel import make_mesh_ep, shard_params_ep

        cfg = self._cfg()
        params = init_vicanet(jax.random.PRNGKey(0), cfg)
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 2, 32, 32, 3))
        K = jnp.broadcast_to(jnp.eye(3), (2, 2, 3, 3))

        def loss(p, mesh=None):
            out, _, _, _, aux = vicanet_forward(
                p, cfg, imgs, K, dtype=jnp.float32, ep_mesh=mesh,
                return_moe_aux=True)
            return (out ** 2).mean() + 0.01 * aux

        g_ref = jax.jit(jax.grad(loss))(params)
        mesh = make_mesh_ep(2, 4)
        sp = shard_params_ep(mesh, params)
        g = jax.jit(jax.grad(lambda p: loss(p, mesh)))(sp)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-4)
