"""End-to-end training smoke tests: the full step (encode -> render -> loss
-> AdamW) must reduce the loss on a tiny synthetic batch, and the optimizer
must respect param groups."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vicasplat_tpu.decoder.splatting import DecoderSplattingConfig
from vicasplat_tpu.models import (
    GaussianAdapterConfig,
    VicaNetConfig,
    VicaSplatConfig,
    init_vicasplat,
)
from vicasplat_tpu.ops.rasterize import RasterizeConfig
from vicasplat_tpu.training import OptimizerConfig, TrainConfig, make_train_step
from vicasplat_tpu.training.optimizer import lr_multiplier_tree, make_optimizer


def tiny_train_cfg():
    return TrainConfig(
        model=VicaSplatConfig(
            backbone=VicaNetConfig(
                img_size=32, patch_size=16, enc_embed_dim=64, enc_depth=2,
                enc_num_heads=4, dec_embed_dim=48, dec_depth=4,
                dec_num_heads=4,
            ),
            gaussian_adapter=GaussianAdapterConfig(sh_degree=1),
        ),
        decoder=DecoderSplattingConfig(
            rasterize=RasterizeConfig(
                tile_px=8, dup_hw=(2, 2), max_per_tile=64, chunk=32,
                tile_group=4,
            )
        ),
        optimizer=OptimizerConfig(lr=1e-3, warm_up_steps=1),
        dtype="float32",
        remat=False,
    )


def tiny_batch(key, B=1, T=2, V=2, size=32):
    k1, k2 = jax.random.split(key)
    K = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
        (B, T, 3, 3),
    )
    eye = jnp.broadcast_to(jnp.eye(4), (B, T, 4, 4))
    ctx = {
        "image": jax.random.uniform(k1, (B, T, size, size, 3)),
        "intrinsics": K,
        "extrinsics": eye,
        "near": jnp.ones((B, T)),
        "far": jnp.full((B, T), 100.0),
    }
    tgt = {
        "image": jax.random.uniform(k2, (B, V, size, size, 3)),
        "intrinsics": K[:, :V],
        "extrinsics": eye[:, :V],
        "near": jnp.ones((B, V)),
        "far": jnp.full((B, V), 100.0),
    }
    return {"context": ctx, "target": tgt}


class TestTrainStep:
    def test_gradient_descends_loss(self):
        """Directional-derivative check of the full pipeline: a small step
        against the gradient must reduce the loss. (Multi-step toy overfits
        are dominated by optimization dynamics — geometry can fly out of the
        frustum at toy learning rates — so this checks the machinery, not
        the schedule.)"""
        from vicasplat_tpu.training.step import compute_loss

        cfg = tiny_train_cfg()
        params = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        batch = tiny_batch(jax.random.PRNGKey(1))
        batch["target"]["image"] = jnp.full_like(batch["target"]["image"], 0.5)

        loss_fn = jax.jit(
            lambda p: compute_loss(p, cfg, batch, 0)[0]
        )
        l0 = float(loss_fn(params))
        grads = jax.jit(jax.grad(lambda p: compute_loss(p, cfg, batch, 0)[0]))(params)
        gnorm = float(
            jnp.sqrt(sum((g**2).sum() for g in jax.tree.leaves(grads)))
        )
        eps = 1e-3 / gnorm
        stepped = jax.tree.map(lambda p, g: p - eps * g, params, grads)
        l1 = float(loss_fn(stepped))
        assert np.isfinite([l0, l1]).all()
        assert l1 < l0, (l0, l1)
        assert gnorm > 0  # gradient norm sanity (covers grad_norm logging)

    def test_multi_step_runs_finite(self):
        cfg = dataclasses.replace(
            tiny_train_cfg(),
            optimizer=OptimizerConfig(lr=1e-5, warm_up_steps=1),
        )
        params = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        optimizer = make_optimizer(params, cfg.optimizer)
        opt_state = optimizer.init(params)
        batch = tiny_batch(jax.random.PRNGKey(1))
        step = jax.jit(make_train_step(cfg, optimizer))
        for i in range(4):
            params, opt_state, logs = step(params, opt_state, batch, i)
            assert np.isfinite(float(logs["loss"]))


class TestParamGroups:
    def test_lr_multipliers(self):
        cfg = tiny_train_cfg()
        params = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        mult = lr_multiplier_tree(params, cfg.optimizer)
        flat = jax.tree_util.tree_flatten_with_path(mult)[0]
        by_path = {jax.tree_util.keystr(p): v for p, v in flat}
        gs_keys = [k for k in by_path if "gaussian_param_head" in k]
        bb_keys = [k for k in by_path if "backbone" in k and "intrinsic_encoder" not in k]
        assert all(by_path[k] == 1.0 for k in gs_keys)
        assert all(by_path[k] == cfg.optimizer.backbone_lr_multiplier for k in bb_keys)
        ie_keys = [k for k in by_path if "intrinsic_encoder" in k]
        assert all(by_path[k] == 1.0 for k in ie_keys)


class TestLinearHeads:
    def test_linear_head_variant(self):
        cfg = dataclasses.replace(
            tiny_train_cfg().model,
            gs_center_head_type="linear",
            gs_param_head_type="linear",
        )
        from vicasplat_tpu.models import vicasplat_forward

        params = init_vicasplat(jax.random.PRNGKey(0), cfg)
        batch = tiny_batch(jax.random.PRNGKey(1))["context"]
        out = vicasplat_forward(params, cfg, batch, dtype=jnp.float32)
        assert out["gaussians"].means.shape == (1, 2, 32, 32, 3)


class TestMomentDtype:
    def test_bf16_mu_tracks_f32_updates(self):
        """moment_dtype='bfloat16' stores Adam's first moment in bf16; the
        resulting updates must stay close to the f32-moment updates."""
        import dataclasses

        from vicasplat_tpu.training.optimizer import (
            OptimizerConfig, make_optimizer,
        )

        key = jax.random.PRNGKey(0)
        p = {"backbone": jax.random.normal(key, (32, 32)) * 0.02}
        g = {"backbone": jax.random.normal(jax.random.split(key)[0], (32, 32))}
        cfg = OptimizerConfig(warm_up_steps=1)
        outs = {}
        for md in ("float32", "bfloat16"):
            opt = make_optimizer(
                p, dataclasses.replace(cfg, moment_dtype=md))
            st = opt.init(p)
            q = p
            for _ in range(5):
                up, st = opt.update(g, st, q)
                q = jax.tree.map(lambda a, b: a + b, q, up)
            outs[md] = q["backbone"]
            mu = st[1][0].mu["backbone"]
            expect = jnp.bfloat16 if md == "bfloat16" else jnp.float32
            assert mu.dtype == expect
        np.testing.assert_allclose(
            np.asarray(outs["float32"]), np.asarray(outs["bfloat16"]),
            atol=2e-5,
        )


class TestGradAccumulation:
    def test_accumulated_step_matches_full_batch(self):
        """accumulate_steps=2 over a B=4 batch must produce the same update
        as the plain step on the full batch: the loss is a batch mean, so
        mean-of-microbatch-grads == full-batch grads (up to f32 summation
        order). Keys are folded per microbatch, so losses with stochastic
        branches would diverge by design — the tiny full-phase config has
        none."""
        import dataclasses

        cfg = tiny_train_cfg()
        params = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        optimizer = make_optimizer(params, cfg.optimizer)
        batch = tiny_batch(jax.random.PRNGKey(1), B=4)

        step_ref = jax.jit(make_train_step(cfg, optimizer))
        cfg_acc = dataclasses.replace(cfg, accumulate_steps=2)
        step_acc = jax.jit(make_train_step(cfg_acc, optimizer))

        s0 = optimizer.init(params)
        p_ref, _, logs_ref = step_ref(params, s0, batch, 0)
        s0b = optimizer.init(params)
        p_acc, _, logs_acc = step_acc(params, s0b, batch, 0)

        np.testing.assert_allclose(
            float(logs_acc["loss"]), float(logs_ref["loss"]), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_acc)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6)

    def test_indivisible_batch_raises(self):
        import dataclasses

        cfg = dataclasses.replace(tiny_train_cfg(), accumulate_steps=3)
        params = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        optimizer = make_optimizer(params, cfg.optimizer)
        step = jax.jit(make_train_step(cfg, optimizer))
        batch = tiny_batch(jax.random.PRNGKey(1), B=4)
        with pytest.raises(ValueError, match="not divisible"):
            step(params, optimizer.init(params), batch, 0)


class TestParamEMA:
    def test_ema_matches_manual_recurrence(self):
        import dataclasses

        from vicasplat_tpu.training.optimizer import get_ema_params

        cfg = tiny_train_cfg()
        opt_cfg = dataclasses.replace(cfg.optimizer, ema_decay=0.9)
        params = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        optimizer = make_optimizer(params, opt_cfg)
        step = jax.jit(make_train_step(cfg, optimizer))
        batch = tiny_batch(jax.random.PRNGKey(1))

        s = optimizer.init(params)
        ema_manual = jax.tree.map(lambda x: np.asarray(x, np.float64), params)
        p = params
        for i in range(3):
            p, s, _ = step(p, s, batch, i)
            ema_manual = jax.tree.map(
                lambda e, q: 0.9 * e + 0.1 * np.asarray(q, np.float64),
                ema_manual, p)
        ema = get_ema_params(s)
        assert ema is not None
        for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(ema_manual)):
            np.testing.assert_allclose(np.asarray(a), b, atol=1e-5)

    def test_off_by_default(self):
        cfg = tiny_train_cfg()
        params = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        optimizer = make_optimizer(params, cfg.optimizer)
        from vicasplat_tpu.training.optimizer import get_ema_params

        assert get_ema_params(optimizer.init(params)) is None
