"""Training resume (full {params, opt_state, step} restore) and staged
distillation (distill_only_steps / distill_max_steps) tests.

Parity targets: reference main.py:175 + config/main.yaml:40-44 (resume via
trainer.fit(ckpt_path=...)), model_wrapper.py:185-301 + config/experiment/
distill.yaml:34-40 (staging).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vicasplat_tpu.models import init_vicasplat
from vicasplat_tpu.training import make_train_step
from vicasplat_tpu.training.optimizer import make_optimizer
from vicasplat_tpu.training.step import compute_loss, pick_phase
from vicasplat_tpu.utils.checkpointing import (
    CheckpointManager,
    restore_train_state,
)

from tests.test_training import tiny_batch, tiny_train_cfg


def _fake_teacher(img1, img2):
    B, H, W, _ = img1.shape
    pts = jnp.zeros((B, H, W, 3))
    conf = jnp.ones((B, H, W))
    return {
        "view1": {"pts3d": pts + 0.1, "conf": conf},
        "view2": {"pts3d": pts + 0.2, "conf": conf},
    }


class TestResume:
    def test_full_state_resume_continues_exactly(self, tmp_path):
        cfg = tiny_train_cfg()
        params0 = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        optimizer = make_optimizer(params0, cfg.optimizer)
        batch = tiny_batch(jax.random.PRNGKey(1))
        step = jax.jit(make_train_step(cfg, optimizer))

        # uninterrupted 4-step run
        p, s = params0, optimizer.init(params0)
        for i in range(4):
            p, s, _ = step(p, s, batch, i)
        ref_params = jax.device_get(p)

        # interrupted run: save full state at step 2, "crash", resume
        ckpt = CheckpointManager(tmp_path / "ck", every_n_steps=2, keep=2)
        p, s = params0, optimizer.init(params0)
        for i in range(2):
            p, s, _ = step(p, s, batch, i)
        ckpt.save(
            2, jax.device_get(p), opt_state=jax.device_get(s),
            extra={"step": np.asarray(2, np.int64)},
        )
        ckpt.finalize()  # async write must land before the "crashed" restore
        del p, s

        fresh_params = init_vicasplat(jax.random.PRNGKey(99), cfg.model)
        fresh_opt = optimizer.init(fresh_params)
        p2, s2, start = restore_train_state(ckpt.latest(), fresh_params, fresh_opt)
        assert start == 2
        for i in range(start, 4):
            p2, s2, _ = step(p2, s2, batch, i)

        for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_weights_only_fallback(self, tmp_path):
        cfg = tiny_train_cfg()
        params = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        optimizer = make_optimizer(params, cfg.optimizer)
        opt_state = optimizer.init(params)
        ckpt = CheckpointManager(tmp_path / "ck", every_n_steps=1)
        ckpt.save(3, jax.device_get(params))  # weights only
        ckpt.finalize()
        p2, s2, start = restore_train_state(ckpt.latest(), params, opt_state)
        assert start == 0  # no step info -> start fresh
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestDistillStaging:
    def test_phase_boundaries(self):
        cfg = dataclasses.replace(
            tiny_train_cfg(), distill_only_steps=10, distill_max_steps=20
        )
        assert pick_phase(cfg, 0, True) == "distill_only"
        assert pick_phase(cfg, 9, True) == "distill_only"
        assert pick_phase(cfg, 10, True) == "distill"
        assert pick_phase(cfg, 20, True) == "distill"  # <= gating (ref :249)
        assert pick_phase(cfg, 21, True) == "full"
        assert pick_phase(cfg, 0, False) == "full"

    def test_distill_only_skips_render(self):
        """distill_only loss = camera + distillation, no mse/lpips
        (reference model_wrapper.py:211-246)."""
        cfg = dataclasses.replace(
            tiny_train_cfg(), distill_only_steps=10, distill_max_steps=10
        )
        params = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        batch = tiny_batch(jax.random.PRNGKey(1))
        key = jax.random.PRNGKey(2)

        _, logs_d = compute_loss(
            params, cfg, batch, 0, teacher_fn=_fake_teacher,
            distill_key=key, phase="distill_only",
        )
        assert "distillation" in logs_d and "camera" in logs_d
        assert "mse" not in logs_d

        _, logs_f = compute_loss(
            params, cfg, batch, 15, teacher_fn=_fake_teacher,
            distill_key=key, phase="distill",
        )
        assert {"mse", "camera", "distillation"} <= set(logs_f)

        _, logs_full = compute_loss(params, cfg, batch, 25, phase="full")
        assert "distillation" not in logs_full and "mse" in logs_full

    def test_distill_losses_finite_and_grad(self):
        cfg = dataclasses.replace(tiny_train_cfg(), distill_only_steps=10)
        params = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        batch = tiny_batch(jax.random.PRNGKey(1))

        def loss(p):
            return compute_loss(
                p, cfg, batch, 0, teacher_fn=_fake_teacher,
                distill_key=jax.random.PRNGKey(2), phase="distill_only",
            )[0]

        l, g = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(l))
        gnorm = float(jnp.sqrt(sum((x ** 2).sum() for x in jax.tree.leaves(g))))
        assert np.isfinite(gnorm) and gnorm > 0


class TestLpipsGate:
    def test_apply_after_step_gates_loss(self):
        from vicasplat_tpu.loss.losses import LossLpipsConfig

        cfg = dataclasses.replace(
            tiny_train_cfg(),
            lpips=LossLpipsConfig(weight=0.5, apply_after_step=100),
        )
        params = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        batch = tiny_batch(jax.random.PRNGKey(1))
        calls = []

        def fake_lpips(a, b):
            calls.append(1)
            return jnp.float32(1.0)

        _, logs_before = compute_loss(params, cfg, batch, 50, lpips_fn=fake_lpips)
        _, logs_after = compute_loss(params, cfg, batch, 150, lpips_fn=fake_lpips)
        assert float(logs_before["lpips"]) == 0.0
        assert float(logs_after["lpips"]) == 0.5


class TestEmaRoundtrip:
    def test_ema_survives_full_state_checkpoint(self, tmp_path):
        """EMA params ride opt_state through save/restore; get_ema_params
        recovers them bit-exact after the round-trip."""
        import dataclasses

        from vicasplat_tpu.training.optimizer import get_ema_params

        cfg = tiny_train_cfg()
        opt_cfg = dataclasses.replace(cfg.optimizer, ema_decay=0.95)
        params = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        optimizer = make_optimizer(params, opt_cfg)
        step = jax.jit(make_train_step(cfg, optimizer))
        batch = tiny_batch(jax.random.PRNGKey(1))
        p, s = params, optimizer.init(params)
        for i in range(2):
            p, s, _ = step(p, s, batch, i)
        ema_before = jax.device_get(get_ema_params(s))

        ckpt = CheckpointManager(tmp_path / "ck", every_n_steps=1)
        ckpt.save(2, jax.device_get(p), opt_state=jax.device_get(s),
                  extra={"step": np.asarray(2, np.int64)})
        ckpt.finalize()

        fresh = init_vicasplat(jax.random.PRNGKey(9), cfg.model)
        _, s2, _ = restore_train_state(
            ckpt.latest(), fresh, optimizer.init(fresh))
        ema_after = get_ema_params(s2)
        assert ema_after is not None
        for a, b in zip(jax.tree.leaves(ema_before),
                        jax.tree.leaves(ema_after)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
