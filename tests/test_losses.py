"""Loss-function unit tests (loss/losses.py).

The translation-direction term exists because the pose study measured
held-out rotation converging (~3 deg) while translation DIRECTION — the
thing pose-AUC actually scores (reference cam_utils.py:186-198) — stalled
at ~40 deg: the dq L1 underweights direction when |t_gt| is small.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vicasplat_tpu.geometry import dual_quaternion as dqlib
from vicasplat_tpu.geometry.se3 import camera_dq_array_from_Rt
from vicasplat_tpu.loss.losses import (
    LossCameraConfig, camera_loss, translation_direction_loss)


def _random_c2w(key, n):
    """Random frame-0-relative c2w stack (identity first frame)."""
    kq, kt = jax.random.split(key)
    q = jax.random.normal(kq, (n, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    from vicasplat_tpu.geometry.quaternion import quat_to_matrix
    R = quat_to_matrix(q)
    t = jax.random.normal(kt, (n, 3)) * 0.3
    m = jnp.tile(jnp.eye(4), (n, 1, 1))
    m = m.at[:, :3, :3].set(R).at[:, :3, 3].set(t)
    return m.at[0].set(jnp.eye(4))


class TestTranslationDirectionLoss:
    def test_zero_when_aligned_any_scale(self):
        t = jnp.array([[1.0, 2.0, -0.5], [0.3, 0.0, 0.1]])
        loss = translation_direction_loss(3.7 * t, t)
        assert float(loss) == pytest.approx(0.0, abs=1e-5)

    def test_max_when_opposed(self):
        t = jnp.array([[1.0, 0.0, 0.0]])
        assert float(translation_direction_loss(-t, t)) == pytest.approx(
            2.0, abs=1e-5)

    def test_degenerate_gt_masked(self):
        pred = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        gt = jnp.array([[0.0, 0.0, 0.0],      # no direction info: masked
                        [0.0, -1.0, 0.0]])    # opposed: 2.0
        assert float(translation_direction_loss(pred, gt)) == pytest.approx(
            2.0, abs=1e-4)
        all_zero = jnp.zeros((3, 3))
        assert float(
            translation_direction_loss(pred[:1], all_zero[:1])) == 0.0

    def test_gradient_finite_at_zero_pred(self):
        gt = jnp.array([[0.0, 0.0, 1.0]])
        g = jax.grad(
            lambda p: translation_direction_loss(p, gt))(jnp.zeros((1, 3)))
        assert np.isfinite(np.asarray(g)).all()


class TestCameraLossDirectionTerm:
    def _setup(self):
        gt_c2w = _random_c2w(jax.random.PRNGKey(3), 5)[None]  # (1, 5, 4, 4)
        gt = gt_c2w[:, 1:]
        pred = camera_dq_array_from_Rt(gt[..., :3, :3], gt[..., :3, 3])
        return gt_c2w, pred

    def test_weight_zero_is_unchanged(self):
        gt_c2w, pred = self._setup()
        noisy = pred + 0.05
        base = camera_loss(noisy, gt_c2w, cfg=LossCameraConfig())
        off = camera_loss(
            noisy, gt_c2w, cfg=LossCameraConfig(trans_dir_weight=0.0))
        assert float(base) == float(off)

    def test_exact_prediction_adds_nothing(self):
        gt_c2w, pred = self._setup()
        on = camera_loss(
            pred, gt_c2w, cfg=LossCameraConfig(trans_dir_weight=1.0))
        off = camera_loss(pred, gt_c2w, cfg=LossCameraConfig())
        assert float(on) == pytest.approx(float(off), abs=1e-5)

    def test_direction_error_is_penalized_dq(self):
        gt_c2w, _ = self._setup()
        gt = gt_c2w[:, 1:]
        # same rotations, translations rotated 90 deg about z (z component
        # kept, so the mean direction error is large but < 90 deg): the dq
        # L1 barely moves for small |t| while the direction term fires
        t = gt[..., :3, 3]
        t_rot = jnp.stack([-t[..., 1], t[..., 0], t[..., 2]], axis=-1)
        bad = camera_dq_array_from_Rt(gt[..., :3, :3], t_rot)
        cfg_on = LossCameraConfig(trans_dir_weight=1.0)
        good_on = camera_loss(
            camera_dq_array_from_Rt(gt[..., :3, :3], t), gt_c2w, cfg=cfg_on)
        bad_on = camera_loss(bad, gt_c2w, cfg=cfg_on)
        bad_off = camera_loss(bad, gt_c2w, cfg=LossCameraConfig())
        assert float(bad_on) - float(bad_off) > 0.3   # direction term fires
        assert float(bad_off) < 0.02                  # dq L1 alone barely moves
        assert float(bad_on) > float(good_on) + 0.3

    def test_qt_camera_type_path(self):
        from vicasplat_tpu.geometry.quaternion import matrix_to_quat
        gt_c2w, _ = self._setup()
        gt = gt_c2w[:, 1:]
        q = matrix_to_quat(gt[..., :3, :3])
        pred = jnp.concatenate([q, gt[..., :3, 3]], axis=-1)
        cfg = LossCameraConfig(camera_type="qt", trans_dir_weight=1.0)
        exact = camera_loss(pred, gt_c2w, cfg=cfg)
        flipped = pred.at[..., 4:7].multiply(-1.0)
        assert float(camera_loss(flipped, gt_c2w, cfg=cfg)) > float(exact)


def test_lpips_random_fallback():
    """make_lpips_fn(allow_random=True) backs the full LPIPS graph with
    seeded-random VGG features when no weights exist: zero for identical
    images, positive and ordered for increasing corruption, jittable."""
    import jax
    import jax.numpy as jnp

    from vicasplat_tpu.loss.lpips import make_lpips_fn

    fn = jax.jit(make_lpips_fn(weights_path="/nonexistent/lpips.pkl",
                               allow_random=True))
    k = jax.random.PRNGKey(0)
    img = jax.random.uniform(k, (1, 32, 32, 3))
    d0 = float(fn(img, img))
    assert abs(d0) < 1e-6
    noise = jax.random.normal(jax.random.PRNGKey(1), img.shape)
    d_small = float(fn(jnp.clip(img + 0.05 * noise, 0, 1), img))
    d_big = float(fn(jnp.clip(img + 0.4 * noise, 0, 1), img))
    assert 0 < d_small < d_big
    # deterministic across constructions (seeded)
    fn2 = make_lpips_fn(weights_path="/nonexistent/lpips.pkl",
                        allow_random=True)
    assert abs(float(fn2(jnp.clip(img + 0.05 * noise, 0, 1), img))
               - d_small) < 1e-5


def test_ssim_grad_finite_on_constant_windows():
    """sqrt'(0) in the Cauchy-Schwarz bound made every upstream grad NaN
    when a window is constant in either image (the empty render of a
    random-init DPT head). The bound is stop_gradient'ed; grads must stay
    finite for constant-vs-textured and constant-vs-constant pairs."""
    import jax
    import jax.numpy as jnp

    from vicasplat_tpu.loss.ssim import ssim

    key = jax.random.PRNGKey(0)
    gt = jax.random.uniform(key, (32, 32, 3))
    zero = jnp.zeros((32, 32, 3))

    g1 = jax.grad(lambda p: ssim(p, gt))(zero)
    assert bool(jnp.isfinite(g1).all())
    g2 = jax.grad(lambda p: ssim(p, zero))(zero)
    assert bool(jnp.isfinite(g2).all())
    # half-constant image: mixed windows
    mixed = gt.at[16:].set(0.25)
    g3 = jax.grad(lambda p: ssim(p, gt))(mixed)
    assert bool(jnp.isfinite(g3).all())
