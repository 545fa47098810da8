"""Long-video streaming reconstruction (streaming.py): exact recovery of
chained poses from scale-perturbed windows, Gaussian re-basing inverses,
and the engine-level sliding-window path."""
import jax
import jax.numpy as jnp
import numpy as np

from tests.test_model import tiny_cfg
from vicasplat_tpu.serving import InferenceEngine
from vicasplat_tpu.streaming import (
    chain_windows, plan_windows, rebase_gaussians, reconstruct_video,
)


def _rand_rot(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _make_trajectory(rng, n):
    poses = [np.eye(4)]
    for _ in range(n - 1):
        step = np.eye(4)
        step[:3, :3] = _rand_rot(rng)
        step[:3, 3] = rng.normal(size=3)
        poses.append(poses[-1] @ step)
    return np.stack(poses)


class TestChaining:
    def test_plan_windows(self):
        assert plan_windows(8, 8, 2) == [0]
        assert plan_windows(14, 8, 2) == [0, 6]
        assert plan_windows(15, 8, 2) == [0, 6, 7]  # tail shifted left
        assert plan_windows(20, 8, 4) == [0, 4, 8, 12]

    def test_exact_recovery_with_per_window_scales(self):
        """Local windows with arbitrary per-window monocular scales chain
        back to the true global trajectory (window-0 metric)."""
        rng = np.random.default_rng(0)
        G = _make_trajectory(rng, 12)
        window, overlap = 5, 3
        starts = plan_windows(12, window, overlap)
        window_scales = [1.0] + [float(s) for s in rng.uniform(
            0.3, 3.0, len(starts) - 1)]
        locals_ = []
        for s, c in zip(starts, window_scales):
            local = np.einsum("ij,tjk->tik", np.linalg.inv(G[s]),
                              G[s:s + window])
            local[:, :3, 3] *= c
            locals_.append(local)
        global_poses, scales, _ = chain_windows(locals_, starts)
        np.testing.assert_allclose(global_poses, G, atol=1e-8)
        # recovered per-window rescale: scale_k * c_k == 1 (window-0 metric)
        np.testing.assert_allclose(scales * np.asarray(window_scales), 1.0,
                                   atol=1e-9)

    def test_seam_frames_agree(self):
        rng = np.random.default_rng(1)
        G = _make_trajectory(rng, 9)
        starts = plan_windows(9, 4, 2)
        locals_ = [np.einsum("ij,tjk->tik", np.linalg.inv(G[s]), G[s:s + 4])
                   for s in starts]
        global_poses, _, bases = chain_windows(locals_, starts)
        # the chaining anchor: each window's base is the global pose of its
        # first frame
        for k, s in enumerate(starts):
            np.testing.assert_allclose(bases[k], G[s], atol=1e-8)


class TestRebase:
    def _gaussians(self, rng, shape=(2, 4, 4)):
        from vicasplat_tpu.models.adapter import Gaussians

        q = rng.normal(size=shape + (4,))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        A = rng.normal(size=shape + (3, 3))
        cov = A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(3)
        return Gaussians(
            means=jnp.asarray(rng.normal(size=shape + (3,)), jnp.float32),
            covariances=jnp.asarray(cov, jnp.float32),
            harmonics=jnp.asarray(rng.normal(size=shape + (3, 25)),
                                  jnp.float32),
            opacities=jnp.asarray(rng.uniform(size=shape), jnp.float32),
            scales=jnp.asarray(rng.uniform(0.1, 1, shape + (3,)), jnp.float32),
            rotations=jnp.asarray(q, jnp.float32),
        )

    def test_identity_is_noop(self):
        g = self._gaussians(np.random.default_rng(0))
        out = rebase_gaussians(g, jnp.eye(4), jnp.float32(1.0), sh_degree=4)
        for a, b in zip(g, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_inverse_roundtrip(self):
        rng = np.random.default_rng(2)
        g = self._gaussians(rng)
        base = np.eye(4)
        base[:3, :3] = _rand_rot(rng)
        base[:3, 3] = rng.normal(size=3)
        fwd = rebase_gaussians(g, jnp.asarray(base, jnp.float32),
                               jnp.float32(2.0), sh_degree=4)
        # inverse of m -> s*R@m + t is m -> (1/s)*R^-1@m + (1/s)*(-R^-1 t):
        # inv(base) with its translation rescaled by 1/s
        base_inv = np.linalg.inv(base)
        base_inv[:3, 3] *= 0.5
        back = rebase_gaussians(
            fwd, jnp.asarray(base_inv, jnp.float32),
            jnp.float32(0.5), sh_degree=4)
        for name, a, b in zip(g._fields, g, back):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-3, err_msg=name)


class TestEngineStreaming:
    def test_reconstruct_video(self):
        cfg = tiny_cfg()
        eng = InferenceEngine(cfg, dtype=jnp.float32)
        F = 5
        images = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(0), (F, 32, 32, 3)))
        K = np.broadcast_to(
            np.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
            (F, 3, 3))
        scene = reconstruct_video(eng, images, K, window=3, overlap=1)
        assert scene.poses.shape == (F, 4, 4)
        np.testing.assert_allclose(scene.poses[0], np.eye(4), atol=1e-6)
        assert scene.gaussians.means.shape[0] == F
        assert np.isfinite(np.asarray(scene.gaussians.means)).all()
        assert np.isfinite(scene.poses).all()
        assert len(scene.window_scales) == len(plan_windows(F, 3, 1))
        # no frame left unfilled: opacities of every frame present
        assert scene.gaussians.opacities.shape[0] == F
