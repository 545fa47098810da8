"""Unit tests for the math layer: quaternions, dual quaternions, SE(3),
projection. Closed-form / round-trip checks (the reference has no test suite;
this is the test pyramid SURVEY.md section 4 calls for)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vicasplat_tpu.geometry import dual_quaternion as dq
from vicasplat_tpu.geometry import projection as proj
from vicasplat_tpu.geometry import se3
from vicasplat_tpu.geometry.quaternion import (
    matrix_to_quat,
    qconj,
    qmul,
    qnormalize,
    qrotate,
    quat_to_matrix,
)


def random_quats(key, shape):
    q = jax.random.normal(key, (*shape, 4))
    return qnormalize(q)


def random_pose(key):
    k1, k2 = jax.random.split(key)
    q = random_quats(k1, ())
    t = jax.random.normal(k2, (3,))
    R = quat_to_matrix(q)
    m = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    return m


class TestQuaternion:
    def test_mul_identity(self):
        key = jax.random.PRNGKey(0)
        q = random_quats(key, (5,))
        e = jnp.zeros((5, 4)).at[:, 3].set(1.0)
        np.testing.assert_allclose(qmul(q, e), q, atol=1e-6)
        np.testing.assert_allclose(qmul(e, q), q, atol=1e-6)

    def test_mul_matches_matrix_product(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        a, b = random_quats(k1, (7,)), random_quats(k2, (7,))
        np.testing.assert_allclose(
            quat_to_matrix(qmul(a, b)),
            quat_to_matrix(a) @ quat_to_matrix(b),
            atol=1e-5,
        )

    def test_rotate_matches_matrix(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        q = random_quats(k1, (4,))
        v = jax.random.normal(k2, (4, 3))
        np.testing.assert_allclose(
            qrotate(q, v),
            jnp.einsum("bij,bj->bi", quat_to_matrix(q), v),
            atol=1e-5,
        )

    def test_matrix_quat_roundtrip(self):
        q = random_quats(jax.random.PRNGKey(3), (64,))
        q2 = matrix_to_quat(quat_to_matrix(q))
        # same rotation up to sign
        dots = jnp.abs((q * q2).sum(-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-5)

    def test_conj_inverse(self):
        q = random_quats(jax.random.PRNGKey(4), (3,))
        e = qmul(q, qconj(q))
        np.testing.assert_allclose(e[:, 3], 1.0, atol=1e-6)
        np.testing.assert_allclose(e[:, :3], 0.0, atol=1e-6)


class TestDualQuaternion:
    def test_matrix_roundtrip(self):
        keys = jax.random.split(jax.random.PRNGKey(10), 8)
        for k in keys:
            m = random_pose(k)
            d = dq.from_matrix(m)
            np.testing.assert_allclose(dq.homogeneous_matrix(d), m, atol=1e-5)

    def test_mul_matches_matrix_product(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(11))
        m1, m2 = random_pose(k1), random_pose(k2)
        d = dq.dqmul(dq.from_matrix(m1), dq.from_matrix(m2))
        np.testing.assert_allclose(dq.homogeneous_matrix(d), m1 @ m2, atol=1e-5)

    def test_inverse(self):
        m = random_pose(jax.random.PRNGKey(12))
        d = dq.from_matrix(m)
        prod = dq.dqmul(d, dq.inverse(d))
        np.testing.assert_allclose(
            dq.homogeneous_matrix(prod), jnp.eye(4), atol=1e-5
        )

    def test_transform_point(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(13))
        m = random_pose(k1)
        p = jax.random.normal(k2, (5, 3))
        d = dq.from_matrix(m)
        expected = jnp.einsum("ij,bj->bi", m[:3, :3], p) + m[:3, 3]
        np.testing.assert_allclose(
            dq.transform_point(dq.DualQuaternion(
                jnp.broadcast_to(d.qr, (5, 4)), jnp.broadcast_to(d.qd, (5, 4))
            ), p),
            expected,
            atol=1e-5,
        )

    def test_from_quat_pose(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(14))
        q = random_quats(k1, ())
        t = jax.random.normal(k2, (3,))
        d = dq.from_quat_pose(jnp.concatenate([q, t]))
        m = dq.homogeneous_matrix(d)
        np.testing.assert_allclose(m[:3, :3], quat_to_matrix(q), atol=1e-5)
        np.testing.assert_allclose(m[:3, 3], t, atol=1e-5)

    def test_normalized(self):
        arr = jax.random.normal(jax.random.PRNGKey(15), (6, 8))
        d = dq.normalized(dq.from_dq_array(arr))
        np.testing.assert_allclose(
            jnp.linalg.norm(d.qr, axis=-1), 1.0, atol=1e-6
        )

    def test_sclerp_endpoints(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(16))
        a, b = dq.from_matrix(random_pose(k1)), dq.from_matrix(random_pose(k2))
        m0 = dq.homogeneous_matrix(dq.sclerp(a, b, 0.0))
        m1 = dq.homogeneous_matrix(dq.sclerp(a, b, 1.0))
        np.testing.assert_allclose(m0, dq.homogeneous_matrix(a), atol=1e-4)
        np.testing.assert_allclose(m1, dq.homogeneous_matrix(b), atol=1e-4)

    def test_sclerp_is_rigid_midpoint(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(17))
        a, b = dq.from_matrix(random_pose(k1)), dq.from_matrix(random_pose(k2))
        mid = dq.sclerp(a, b, 0.5)
        m = dq.homogeneous_matrix(mid)
        R = m[:3, :3]
        np.testing.assert_allclose(R @ R.T, jnp.eye(3), atol=1e-4)


class TestSE3:
    def test_so3_exp_small_angle(self):
        theta = jnp.array([1e-8, 0.0, 0.0])
        np.testing.assert_allclose(se3.so3_exp(theta), jnp.eye(3), atol=1e-6)

    def test_so3_exp_axis_angle(self):
        theta = jnp.array([0.0, 0.0, jnp.pi / 2])
        R = se3.so3_exp(theta)
        expected = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_se3_exp_pure_translation(self):
        tau = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
        T = se3.se3_exp(tau)
        np.testing.assert_allclose(T[:3, 3], jnp.array([1.0, 2.0, 3.0]), atol=1e-6)
        np.testing.assert_allclose(T[:3, :3], jnp.eye(3), atol=1e-6)

    def test_update_pose_zero_delta(self):
        m = random_pose(jax.random.PRNGKey(20))[None]
        out = se3.update_pose(jnp.zeros((1, 3)), jnp.zeros((1, 3)), m)
        np.testing.assert_allclose(out, m, atol=1e-5)

    def test_camera_normalization(self):
        keys = jax.random.split(jax.random.PRNGKey(21), 4)
        poses = jnp.stack([random_pose(k) for k in keys])
        out = se3.camera_normalization(poses[0], poses)
        np.testing.assert_allclose(out[0], jnp.eye(4), atol=1e-5)

    def test_dq_matrix_consistency(self):
        """camera_matrix_from_dq_array inverts camera_dq_array_from_Rt."""
        m = random_pose(jax.random.PRNGKey(22))
        arr = se3.camera_dq_array_from_Rt(m[:3, :3], m[:3, 3])
        m2 = se3.camera_matrix_from_dq_array(arr)
        np.testing.assert_allclose(m2, m, atol=1e-5)

    def test_intrinsics_from_fov(self):
        fov = jnp.array([jnp.pi / 2, jnp.pi / 2])
        K = se3.intrinsics_from_fov(fov)
        np.testing.assert_allclose(K[0, 0], 0.5, atol=1e-6)
        np.testing.assert_allclose(K[0, 2], 0.5, atol=1e-6)
        # round trip through get_fov
        fov2 = proj.get_fov(K)
        np.testing.assert_allclose(fov2, fov, atol=1e-4)


class TestProjection:
    def test_project_unproject_roundtrip(self):
        key = jax.random.PRNGKey(30)
        K = jnp.array([[1.2, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]])
        coords = jax.random.uniform(key, (10, 2), minval=0.2, maxval=0.8)
        z = jnp.ones(10) * 2.0
        pts = proj.unproject(coords, z, K)
        xy = proj.project_camera_space(pts, K)
        np.testing.assert_allclose(xy, coords, atol=1e-5)

    def test_world_rays_through_pixels(self):
        m = random_pose(jax.random.PRNGKey(31))
        K = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
        coords = jnp.array([[0.5, 0.5], [0.25, 0.75]])
        o, d = proj.get_world_rays(coords, m, K)
        pts = o + d * 3.1
        xy, front = proj.project(pts, m, K)
        assert bool(front.all())
        np.testing.assert_allclose(xy, coords, atol=1e-5)

    def test_sample_image_grid(self):
        coords, idx = proj.sample_image_grid((4, 8))
        assert coords.shape == (4, 8, 2)
        assert idx.shape == (4, 8, 2)
        np.testing.assert_allclose(coords[0, 0], [0.5 / 8, 0.5 / 4], atol=1e-6)
        np.testing.assert_allclose(coords[3, 7], [7.5 / 8, 3.5 / 4], atol=1e-6)
        assert idx[2, 5].tolist() == [2, 5]


class TestRope:
    def test_rope_2d_preserves_norm(self):
        from vicasplat_tpu.ops import rope

        pos = rope.grid_positions(4, 4)
        cos, sin = rope.make_rope_2d_tables(pos, 64)
        x = jax.random.normal(jax.random.PRNGKey(40), (2, 16, 64))
        y = rope.apply_rope_2d(x, cos, sin)
        np.testing.assert_allclose(
            jnp.linalg.norm(y, axis=-1), jnp.linalg.norm(x, axis=-1), atol=1e-4
        )

    def test_rope_2d_zero_position_identity(self):
        from vicasplat_tpu.ops import rope

        pos = np.zeros((3, 2), dtype=np.int64)
        cos, sin = rope.make_rope_2d_tables(pos, 32)
        x = jax.random.normal(jax.random.PRNGKey(41), (3, 32))
        np.testing.assert_allclose(rope.apply_rope_2d(x, cos, sin), x, atol=1e-6)

    def test_rope_2d_relative_property(self):
        """<RoPE(q, p1), RoPE(k, p2)> depends only on p1 - p2 (per axis)."""
        from vicasplat_tpu.ops import rope

        key = jax.random.PRNGKey(42)
        q = jax.random.normal(key, (1, 64))
        k = jax.random.normal(jax.random.fold_in(key, 1), (1, 64))

        def dot_at(p1, p2):
            cos1, sin1 = rope.make_rope_2d_tables(np.array([p1]), 64)
            cos2, sin2 = rope.make_rope_2d_tables(np.array([p2]), 64)
            qq = rope.apply_rope_2d(q, cos1, sin1)
            kk = rope.apply_rope_2d(k, cos2, sin2)
            return float((qq * kk).sum())

        a = dot_at((3, 5), (1, 2))
        b = dot_at((5, 8), (3, 5))
        assert abs(a - b) < 1e-3

    def test_rope_interleaved_norm_and_identity(self):
        from vicasplat_tpu.ops import rope

        cos, sin = rope.make_rope_nd_tables([64], [8], theta=30.0)
        x = jax.random.normal(jax.random.PRNGKey(43), (2, 8, 64))
        y = rope.apply_rope_interleaved(x, cos, sin)
        np.testing.assert_allclose(
            jnp.linalg.norm(y, axis=-1), jnp.linalg.norm(x, axis=-1), atol=1e-4
        )
        # position 0 is identity
        np.testing.assert_allclose(y[:, 0], x[:, 0], atol=1e-6)

    def test_rope_nd_table_shapes(self):
        from vicasplat_tpu.ops import rope

        cos, sin = rope.make_rope_nd_tables([16, 24, 24], [2, 4, 4], theta=100.0)
        assert cos.shape == (32, 64)
        assert sin.shape == (32, 64)


class TestCameraEmb:
    def test_intrinsic_embedding_shape(self):
        from vicasplat_tpu.geometry.camera_emb import get_intrinsic_embedding

        K = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
        emb = get_intrinsic_embedding(K[None], (8, 8), degree=4)
        assert emb.shape == (1, 8, 8, 25)
        assert jnp.isfinite(emb).all()


class TestPnP:
    def test_recovers_known_pose(self):
        pytest.importorskip("cv2")
        from vicasplat_tpu.geometry.se3 import get_pnp_pose, so3_exp
        from vicasplat_tpu.geometry.projection import get_world_rays

        h = w = 32
        K = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
        c2w = jnp.eye(4).at[:3, :3].set(so3_exp(jnp.array([0.1, -0.2, 0.05])))
        c2w = c2w.at[:3, 3].set(jnp.array([0.3, -0.1, 0.2]))
        # integer-pixel convention matching cv2/mgrid (the reference's
        # get_pnp_pose uses np.mgrid integer pixels against pixel-scaled K)
        jj, ii = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
        coords = jnp.asarray(
            np.stack([jj / w, ii / h], axis=-1), jnp.float32
        )
        o, d = get_world_rays(coords.reshape(-1, 2), c2w, K)
        key = jax.random.PRNGKey(0)
        depths = jax.random.uniform(key, (h * w,), minval=2.0, maxval=5.0)
        pts = (o + d * depths[:, None]).reshape(h, w, 3)
        pose = get_pnp_pose(pts, np.ones((h, w)), K, h, w)
        np.testing.assert_allclose(pose, np.asarray(c2w), atol=1e-3)
