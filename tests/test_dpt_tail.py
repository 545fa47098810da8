"""Fused DPT head tail kernel (ops/dpt_tail.py) vs the XLA reference.

Runs in pallas interpret mode on the CPU suite; the TPU timing lives in
tools/jobs (the kernel exists to remove the measured full-res activation
materialization around the merger add — DESIGN.md §2)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vicasplat_tpu.ops.dpt_tail import _xla_tail, fused_dpt_tail


def _inputs(key, N=2, H=32, W=32, C=128, F=128, O=128, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    a = jax.random.normal(ks[0], (N, H, W, C), dtype)
    m = jax.nn.relu(jax.random.normal(ks[1], (N, H, W, C), dtype))
    w1 = (jax.random.normal(ks[2], (3, 3, C, F), dtype)
          / float(np.sqrt(9 * C))).astype(dtype)
    b1 = jax.random.normal(ks[5], (1, F), dtype)
    w2 = (jax.random.normal(ks[3], (F, O), dtype)
          / float(np.sqrt(F))).astype(dtype)
    b2 = jax.random.normal(ks[4], (1, O), dtype)
    return a, m, w1, b1, w2, b2


class TestFusedDptTail:
    def test_matches_xla_reference(self):
        args = _inputs(jax.random.PRNGKey(0))
        got = fused_dpt_tail(*args, 8)
        want = _xla_tail(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)

    def test_no_merge_variant(self):
        a, _, w1, b1, w2, b2 = _inputs(jax.random.PRNGKey(4))
        got = fused_dpt_tail(a, None, w1, b1, w2, b2, 8)
        want = _xla_tail(a, None, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)

    def test_single_band_and_uneven_bands(self):
        # bh == H (no halo rows used) and bh=4 (many bands)
        args = _inputs(jax.random.PRNGKey(1), H=16, W=16)
        want = _xla_tail(*args)
        for bh in (16, 4):
            got = fused_dpt_tail(*args, bh)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-4, rtol=2e-4)

    def test_bf16_close(self):
        args = _inputs(jax.random.PRNGKey(2), dtype=jnp.bfloat16)
        got = np.asarray(fused_dpt_tail(*args, 8), np.float32)
        want = np.asarray(_xla_tail(*args), np.float32)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() < 0.05 * scale

    def test_gs_head_backend_parity(self):
        # the gated path in dpt_gs_head (tail_backend="pallas") matches the
        # XLA default on the same params
        from vicasplat_tpu.models.heads import (
            DPTConfig, dpt_gs_head, init_dpt,
        )

        cfg_x = DPTConfig(hook_dims=(64, 64, 64, 64),
                          layer_dims=(24, 48, 96, 192), feature_dim=128,
                          head_type="gs_params", num_channels=82,
                          use_input_merger=True)
        cfg_p = dataclasses.replace(cfg_x, tail_backend="pallas")
        key = jax.random.PRNGKey(0)
        p = init_dpt(key, cfg_x)
        gh = 4
        hooks = [jax.random.normal(k, (2, gh * gh, 64))
                 for k in jax.random.split(key, 4)]
        imgs = jax.random.normal(key, (2, 16 * gh, 16 * gh, 3))
        a = dpt_gs_head(p, cfg_x, hooks, (gh, gh), imgs, jnp.float32)
        b = dpt_gs_head(p, cfg_p, hooks, (gh, gh), imgs, jnp.float32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)

    def test_regression_head_backend_parity(self):
        # center head: fused no-merge tail (conv2+relu+conv3) vs XLA
        from vicasplat_tpu.models.heads import (
            DPTConfig, dpt_regression_head, init_dpt,
        )

        # num_channels >= 64: below that the gate keeps XLA (lane-padding
        # write amplification — heads.py) and the fused path wouldn't run
        cfg_x = DPTConfig(hook_dims=(64, 64, 64, 64),
                          layer_dims=(24, 48, 96, 192), feature_dim=256,
                          last_dim=128, head_type="regression",
                          num_channels=80)
        cfg_p = dataclasses.replace(cfg_x, tail_backend="pallas")
        key = jax.random.PRNGKey(1)
        p = init_dpt(key, cfg_x)
        gh = 4
        hooks = [jax.random.normal(k, (2, gh * gh, 64))
                 for k in jax.random.split(key, 4)]
        a = dpt_regression_head(p, cfg_x, hooks, (gh, gh), jnp.float32)
        b = dpt_regression_head(p, cfg_p, hooks, (gh, gh), jnp.float32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)

    def test_gradients_via_xla_backward(self):
        args = _inputs(jax.random.PRNGKey(3), N=1, H=16, W=16)

        def loss_fused(a, m, w1, b1, w2, b2):
            return (fused_dpt_tail(a, m, w1, b1, w2, b2, 8) ** 2).sum()

        def loss_ref(a, m, w1, b1, w2, b2):
            return (_xla_tail(a, m, w1, b1, w2, b2) ** 2).sum()

        g1 = jax.grad(loss_fused, argnums=(0, 2, 3, 4))(*args)
        g2 = jax.grad(loss_ref, argnums=(0, 2, 3, 4))(*args)
        for a_, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       atol=3e-3, rtol=3e-3)
