"""Rasterizer tests: tiled pipeline vs brute-force oracle, differentiability,
pose-delta gradients, SH evaluation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vicasplat_tpu.models.adapter import build_covariance
from vicasplat_tpu.ops.rasterize import RasterizeConfig, render
from vicasplat_tpu.ops.rasterize.reference import render_view_bruteforce
from vicasplat_tpu.ops.sh import eval_sh_colors, sh_basis


def make_scene(key, n=64, d_sh=1):
    ks = jax.random.split(key, 6)
    means = jax.random.uniform(ks[0], (n, 3), minval=-1.0, maxval=1.0)
    means = means.at[:, 2].set(means[:, 2] + 3.0)  # in front of camera
    scales = jax.random.uniform(ks[1], (n, 3), minval=0.02, maxval=0.1)
    quats = jax.random.normal(ks[2], (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    covs = build_covariance(scales, quats)
    sh = jax.random.normal(ks[3], (n, 3, d_sh)) * 0.3
    opac = jax.random.uniform(ks[4], (n,), minval=0.3, maxval=0.9)
    return means, covs, sh, opac


CAM = {
    "extrinsics": jnp.eye(4)[None],
    "intrinsics": jnp.array([[[1.2, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]]]),
}
BG = jnp.zeros(3)
# exact f32 payload rows (the production default); the optional packed
# bf16-row path (packed_gather=True) is covered by TestPackedGather at its
# own tolerance.
CFG = RasterizeConfig(tile_px=8, dup_hw=(4, 4), max_per_tile=64, chunk=32,
                      tile_group=16, packed_gather=False)


class TestTiledVsBruteForce:
    def test_matches_oracle(self):
        means, covs, sh, opac = make_scene(jax.random.PRNGKey(0))
        shape = (32, 32)
        color, depth, alpha = render(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            shape, BG, sh_degree=0, cfg=CFG,
        )
        c_ref, d_ref, a_ref = render_view_bruteforce(
            means, covs, sh, opac, jnp.eye(4), CAM["intrinsics"][0],
            shape, BG, sh_degree=0,
        )
        np.testing.assert_allclose(color[0], c_ref, atol=2e-3)
        np.testing.assert_allclose(alpha[0], a_ref, atol=2e-3)
        np.testing.assert_allclose(depth[0], d_ref, atol=2e-2)

    def test_max_per_tile_below_chunk(self):
        # adaptive caps can pick max_per_tile smaller than the compositing
        # chunk; composite_tiles must clamp the chunk, not assert
        means, covs, sh, opac = make_scene(jax.random.PRNGKey(0))
        kw = dict(tile_px=8, dup_hw=(4, 4), tile_group=16)
        small = RasterizeConfig(max_per_tile=32, chunk=64, **kw)
        ref = RasterizeConfig(max_per_tile=32, chunk=32, **kw)
        a = render(means, covs, sh, opac, CAM["extrinsics"],
                   CAM["intrinsics"], (32, 32), BG, sh_degree=0, cfg=small)
        b = render(means, covs, sh, opac, CAM["extrinsics"],
                   CAM["intrinsics"], (32, 32), BG, sh_degree=0, cfg=ref)
        np.testing.assert_allclose(a[0], b[0], atol=1e-5)

    def test_background_fill(self):
        means, covs, sh, opac = make_scene(jax.random.PRNGKey(1), n=4)
        bg = jnp.array([0.2, 0.4, 0.6])
        color, _, alpha = render(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            (32, 32), bg, sh_degree=0, cfg=CFG,
        )
        # corners should be (nearly) pure background with only 4 tiny splats
        corner = color[0, 0, 0]
        assert float(alpha[0].min()) < 0.05
        np.testing.assert_allclose(
            color[0][alpha[0] < 0.01],
            jnp.broadcast_to(bg, color[0][alpha[0] < 0.01].shape),
            atol=1e-2,
        )

    def test_tiny_scene_fewer_candidates_than_capacity(self):
        # regression: n*KH*KW < max_per_tile made the contiguous-slice
        # binning trace a dynamic_slice larger than the sorted array
        # (ADVICE r2). 4 splats x (2,2) window = 16 candidates < K=64.
        means, covs, sh, opac = make_scene(jax.random.PRNGKey(3), n=4)
        cfg = RasterizeConfig(tile_px=8, dup_hw=(2, 2), max_per_tile=64,
                              chunk=32, tile_group=4, packed_gather=False)
        shape = (32, 32)
        color, depth, alpha = render(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            shape, BG, sh_degree=0, cfg=cfg,
        )
        c_ref, d_ref, a_ref = render_view_bruteforce(
            means, covs, sh, opac, jnp.eye(4), CAM["intrinsics"][0],
            shape, BG, sh_degree=0,
        )
        np.testing.assert_allclose(color[0], c_ref, atol=2e-3)
        np.testing.assert_allclose(alpha[0], a_ref, atol=2e-3)

    def test_empty_scene(self):
        means = jnp.zeros((8, 3)).at[:, 2].set(-5.0)  # all behind camera
        covs = jnp.broadcast_to(jnp.eye(3) * 1e-4, (8, 3, 3))
        sh = jnp.zeros((8, 3, 1))
        opac = jnp.ones(8)
        bg = jnp.array([1.0, 0.0, 0.0])
        color, depth, alpha = render(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            (16, 16), bg, sh_degree=0,
            cfg=RasterizeConfig(tile_px=8, dup_hw=(2, 2), max_per_tile=32, chunk=32, tile_group=4),
        )
        np.testing.assert_allclose(alpha[0], 0.0, atol=1e-7)
        np.testing.assert_allclose(color[0, :, :, 0], 1.0, atol=1e-6)


class TestGradients:
    def test_grads_to_all_params(self):
        means, covs, sh, opac = make_scene(jax.random.PRNGKey(2), n=32)
        target = jnp.full((16, 16, 3), 0.5)
        cfg = RasterizeConfig(tile_px=8, dup_hw=(3, 3), max_per_tile=64, chunk=32, tile_group=4)

        def loss(m, c, s, o):
            color, _, _ = render(
                m, c, s, o, CAM["extrinsics"], CAM["intrinsics"],
                (16, 16), BG, sh_degree=0, cfg=cfg,
            )
            return ((color[0] - target) ** 2).mean()

        gm, gc, gs, go = jax.grad(loss, argnums=(0, 1, 2, 3))(means, covs, sh, opac)
        for g in (gm, gc, gs, go):
            assert jnp.isfinite(g).all()
        assert float(jnp.abs(gm).max()) > 0
        assert float(jnp.abs(gs).max()) > 0
        assert float(jnp.abs(go).max()) > 0

    def test_pose_delta_gradients(self):
        """theta/rho gradients — the pose-alignment contract."""
        means, covs, sh, opac = make_scene(jax.random.PRNGKey(3), n=32)
        cfg = RasterizeConfig(tile_px=8, dup_hw=(3, 3), max_per_tile=64, chunk=32, tile_group=4)
        target, _, _ = render(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            (16, 16), BG, sh_degree=0, cfg=cfg,
        )

        def loss(rot_delta, trans_delta):
            color, _, _ = render(
                means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
                (16, 16), BG, sh_degree=0,
                cam_rot_delta=rot_delta, cam_trans_delta=trans_delta, cfg=cfg,
            )
            return ((color - target) ** 2).mean()

        z3 = jnp.zeros((1, 3))
        gr, gt = jax.grad(loss, argnums=(0, 1))(z3, z3)
        assert jnp.isfinite(gr).all() and jnp.isfinite(gt).all()
        # at the optimum, gradient should be ~0
        np.testing.assert_allclose(gr, 0.0, atol=1e-5)
        # a small perturbation should produce a restoring gradient
        eps = jnp.array([[0.01, 0.0, 0.0]])
        gr2, _ = jax.grad(loss, argnums=(0, 1))(eps, z3)
        assert float(jnp.abs(gr2).max()) > 0

    def test_finite_difference_mean(self):
        """Gradient wrt a gaussian mean matches finite differences."""
        means, covs, sh, opac = make_scene(jax.random.PRNGKey(4), n=8)
        cfg = RasterizeConfig(tile_px=8, dup_hw=(4, 4), max_per_tile=32, chunk=32, tile_group=4)

        def loss(m):
            color, _, _ = render(
                m, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
                (16, 16), BG, sh_degree=0, cfg=cfg,
            )
            return (color ** 2).sum()

        g = jax.grad(loss)(means)
        eps = 1e-3
        for idx in [(0, 0), (3, 2)]:
            m_p = means.at[idx].add(eps)
            m_m = means.at[idx].add(-eps)
            fd = (loss(m_p) - loss(m_m)) / (2 * eps)
            np.testing.assert_allclose(g[idx], fd, rtol=0.05, atol=1e-3)


class TestSH:
    def test_degree0_constant(self):
        dirs = jax.random.normal(jax.random.PRNGKey(0), (10, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        b = sh_basis(dirs, 0)
        np.testing.assert_allclose(b, 0.28209479, atol=1e-6)

    def test_basis_orthonormal(self):
        """Monte-Carlo orthonormality of the real SH basis up to degree 4."""
        key = jax.random.PRNGKey(1)
        dirs = jax.random.normal(key, (200000, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        b = sh_basis(dirs, 4)  # (M, 25)
        gram = (b.T @ b) / dirs.shape[0] * (4 * jnp.pi)
        np.testing.assert_allclose(gram, jnp.eye(25), atol=0.05)

    def test_high_degree_matches_reference_table(self):
        """Degrees 5-8 recurrence vs the reference's generated rsh_cart_8
        polynomial table (reference src/misc/sht.py:833)."""
        import importlib.util
        import pathlib

        sht_path = pathlib.Path("/root/reference/src/misc/sht.py")
        if not sht_path.exists():
            pytest.skip("reference sht.py not present")
        import torch

        spec = importlib.util.spec_from_file_location("ref_sht", sht_path)
        ref_sht = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_sht)

        dirs = jax.random.normal(jax.random.PRNGKey(7), (64, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        ours = np.asarray(sh_basis(dirs, 8))  # (64, 81)
        ref = ref_sht.rsh_cart_8(torch.from_numpy(np.asarray(dirs))).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_high_degree_orthonormal(self):
        key = jax.random.PRNGKey(2)
        dirs = jax.random.normal(key, (400000, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        b = sh_basis(dirs, 6)  # (M, 49)
        gram = (b.T @ b) / dirs.shape[0] * (4 * jnp.pi)
        np.testing.assert_allclose(gram, jnp.eye(49), atol=0.08)

    def test_color_clamp(self):
        sh = -10 * jnp.ones((5, 3, 1))
        dirs = jnp.array([[0.0, 0.0, 1.0]] * 5)
        c = eval_sh_colors(sh, dirs, 0)
        np.testing.assert_allclose(c, 0.0)


class TestPallasComposite:
    def test_matches_xla_path(self):
        """Pallas fused compositing (interpret mode on CPU) == XLA path."""
        from vicasplat_tpu.ops.rasterize import RasterizeConfig as RC
        from vicasplat_tpu.ops.rasterize import render as render_fn

        means, covs, sh, opac = make_scene(jax.random.PRNGKey(7), n=64)
        shape = (32, 32)
        base = dict(tile_px=8, dup_hw=(4, 4), max_per_tile=64, chunk=32,
                    tile_group=16)
        cx, dx, ax = render_fn(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            shape, BG, sh_degree=0, cfg=RC(**base, backend="xla"),
        )
        cp, dp, ap = render_fn(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            shape, (0.0, 0.0, 0.0), sh_degree=0, cfg=RC(**base, backend="pallas"),
        )
        np.testing.assert_allclose(cp, cx, atol=2e-3)
        np.testing.assert_allclose(dp, dx, atol=2e-2)
        np.testing.assert_allclose(ap, ax, atol=2e-3)

    def test_gradients_via_xla_fallback(self):
        from vicasplat_tpu.ops.rasterize import RasterizeConfig as RC
        from vicasplat_tpu.ops.rasterize import render as render_fn

        means, covs, sh, opac = make_scene(jax.random.PRNGKey(8), n=32)
        cfg = RC(tile_px=8, dup_hw=(3, 3), max_per_tile=64, chunk=32,
                 tile_group=4, backend="pallas")

        def loss(m):
            c, _, _ = render_fn(
                m, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
                (16, 16), (0.0, 0.0, 0.0), sh_degree=0, cfg=cfg,
            )
            return (c ** 2).sum()

        g = jax.grad(loss)(means)
        assert jnp.isfinite(g).all() and float(jnp.abs(g).max()) > 0
        # must match the xla backend's gradient
        cfg2 = RC(tile_px=8, dup_hw=(3, 3), max_per_tile=64, chunk=32,
                  tile_group=4, backend="xla")

        def loss2(m):
            c, _, _ = render_fn(
                m, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
                (16, 16), BG, sh_degree=0, cfg=cfg2,
            )
            return (c ** 2).sum()

        g2 = jax.grad(loss2)(means)
        np.testing.assert_allclose(g, g2, rtol=1e-3, atol=1e-5)


class TestRotateSH:
    def test_rotated_function_values(self):
        """rotate_sh must satisfy f'(d) = f(R^T d) at arbitrary directions."""
        from vicasplat_tpu.geometry.se3 import so3_exp
        from vicasplat_tpu.ops.sh import rotate_sh, sh_basis

        key = jax.random.PRNGKey(0)
        coeffs = jax.random.normal(key, (5, 25))
        R = so3_exp(jnp.array([0.3, -0.5, 0.8]))
        rotated = rotate_sh(coeffs, R)

        dirs = jax.random.normal(jax.random.PRNGKey(1), (40, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        f_rot = sh_basis(dirs, 4) @ rotated.T          # (40, 5)
        f_orig = sh_basis(dirs @ R, 4) @ coeffs.T       # f(R^T d)
        np.testing.assert_allclose(f_rot, f_orig, atol=1e-4)

    def test_identity_rotation(self):
        from vicasplat_tpu.ops.sh import rotate_sh

        coeffs = jax.random.normal(jax.random.PRNGKey(2), (3, 9))
        out = rotate_sh(coeffs, jnp.eye(3))
        np.testing.assert_allclose(out, coeffs, atol=1e-5)


class TestHighResolution:
    def test_512px_render_matches_oracle(self):
        """>=512px rendering (VERDICT item 5): the packed key's tile-id bits
        scale with the tile count (1024 tiles at 512^2/16px), matching the
        reference's arbitrary-resolution renders (cuda_splatting.py:91-117)."""
        means, covs, sh, opac = make_scene(jax.random.PRNGKey(3), n=48)
        covs = covs * 0.25  # halve radii so the 8x8 dup window covers fully
        shape = (512, 512)
        # radii double in pixels at 512^2, so the dup window must widen to
        # keep full coverage (8x8 tiles = radius <= 64px here)
        cfg = RasterizeConfig(tile_px=16, dup_hw=(8, 8), max_per_tile=64,
                              chunk=32, tile_group=64, packed_gather=False)
        color, depth, alpha = render(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            shape, BG, sh_degree=0, cfg=cfg,
        )
        c_ref, d_ref, a_ref = render_view_bruteforce(
            means, covs, sh, opac, jnp.eye(4), CAM["intrinsics"][0],
            shape, BG, sh_degree=0,
        )
        assert color.shape == (1, 512, 512, 3)
        np.testing.assert_allclose(color[0], c_ref, atol=2e-3)
        np.testing.assert_allclose(alpha[0], a_ref, atol=2e-3)

    def test_rectangular_render(self):
        """Non-square images (th != tw) stitch correctly."""
        means, covs, sh, opac = make_scene(jax.random.PRNGKey(4), n=32)
        covs = covs * 0.25  # keep radii within the 4x4 dup window at 256px
        shape = (128, 256)
        cfg = RasterizeConfig(tile_px=16, dup_hw=(4, 4), max_per_tile=64,
                              chunk=32, tile_group=32, packed_gather=False)
        color, _, alpha = render(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            shape, BG, sh_degree=0, cfg=cfg,
        )
        c_ref, _, a_ref = render_view_bruteforce(
            means, covs, sh, opac, jnp.eye(4), CAM["intrinsics"][0],
            shape, BG, sh_degree=0,
        )
        np.testing.assert_allclose(color[0], c_ref, atol=2e-3)


class TestPackedGather:
    """The production 32-byte packed payload rows (tiles.packed_row_gather):
    geometry columns are bit-exact f32; alpha/color round to bf16."""

    def test_pack_roundtrip_f32_fields_exact(self):
        from vicasplat_tpu.ops.rasterize.tiles import _pack_words, _unpack_words

        p = jax.random.normal(jax.random.PRNGKey(0), (64, 16))
        q = _unpack_words(_pack_words(p))
        # mean2d, conic, depth are bit-exact
        for col in (0, 1, 2, 3, 4, 9):
            np.testing.assert_array_equal(np.asarray(q[:, col]), np.asarray(p[:, col]))
        # alpha/color round to bf16 (<= 0.4% relative)
        for col in (5, 6, 7, 8):
            np.testing.assert_allclose(q[:, col], p[:, col], rtol=4e-3)

    def test_packed_render_close_to_exact(self):
        import dataclasses

        means, covs, sh, opac = make_scene(jax.random.PRNGKey(11))
        shape = (32, 32)
        cfg_packed = dataclasses.replace(CFG, packed_gather=True)
        cp, dp, ap = render(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            shape, BG, sh_degree=0, cfg=cfg_packed,
        )
        cx, dx, ax = render(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            shape, BG, sh_degree=0, cfg=CFG,
        )
        np.testing.assert_allclose(cp, cx, atol=1.5e-2)
        np.testing.assert_allclose(ap, ax, atol=1.5e-2)
        np.testing.assert_allclose(dp, dx, atol=5e-2)

    def test_packed_gradients_match_exact(self):
        import dataclasses

        means, covs, sh, opac = make_scene(jax.random.PRNGKey(12), n=32)
        base = RasterizeConfig(tile_px=8, dup_hw=(3, 3), max_per_tile=64,
                               chunk=32, tile_group=4, packed_gather=False)

        def make_loss(cfg):
            def loss(m, s, o):
                c, _, _ = render(
                    m, covs, s, o, CAM["extrinsics"], CAM["intrinsics"],
                    (16, 16), BG, sh_degree=0, cfg=cfg,
                )
                return (c ** 2).sum()
            return loss

        g_exact = jax.grad(make_loss(base), argnums=(0, 1, 2))(means, sh, opac)
        g_packed = jax.grad(
            make_loss(dataclasses.replace(base, packed_gather=True)),
            argnums=(0, 1, 2),
        )(means, sh, opac)
        for ge, gp in zip(g_exact, g_packed):
            assert jnp.isfinite(gp).all()
            # bf16-rounded alpha can flip a 1/255 skip threshold for a
            # borderline splat, so allow isolated discrete deviations: 95%
            # of elements tight, all elements bounded relative to the scale
            err = np.abs(np.asarray(gp) - np.asarray(ge)).ravel()
            scale = np.abs(np.asarray(ge)).max() + 1e-8
            assert np.quantile(err, 0.95) <= 0.05 * scale + 2e-3
            assert err.max() <= 0.3 * scale


class TestCoverageStats:
    def test_reports_truncation_and_overflow(self):
        from vicasplat_tpu.ops.rasterize.render import coverage_stats

        means, covs, sh, opac = make_scene(jax.random.PRNGKey(5), n=64)
        # big splats + tiny dup window -> truncation must be reported
        stats = jax.jit(
            lambda: coverage_stats(
                means, covs * 9.0, sh, opac, jnp.eye(4), CAM["intrinsics"][0],
                (32, 32), 0,
                cfg=RasterizeConfig(tile_px=8, dup_hw=(2, 2), max_per_tile=32,
                                    chunk=32, tile_group=4),
            )
        )()
        assert float(stats["truncated_frac"]) > 0.2
        # generous window + K -> no truncation, no overflow
        stats2 = jax.jit(
            lambda: coverage_stats(
                means, covs * 0.05, sh, opac, jnp.eye(4),
                CAM["intrinsics"][0], (32, 32), 0,
                cfg=RasterizeConfig(tile_px=8, dup_hw=(4, 4), max_per_tile=64,
                                    chunk=32, tile_group=4),
            )
        )()
        assert float(stats2["truncated_frac"]) == 0.0
        assert float(stats2["tile_overflow_frac"]) < 0.5


class TestDecoderCovFallback:
    def test_baked_covariances_render_like_scales_rotations(self):
        # scales/rotations are the source of truth, but Gaussians carrying
        # only baked covariances (e.g. loaded from PLY) must render the
        # same, not silently wrong (ADVICE r2).
        from vicasplat_tpu.decoder.splatting import (
            DecoderSplattingConfig, decoder_forward,
        )
        from vicasplat_tpu.models.adapter import Gaussians

        key = jax.random.PRNGKey(7)
        ks = jax.random.split(key, 4)
        n = 32
        means = jax.random.normal(ks[0], (1, n, 3)) * 0.3
        means = means.at[..., 2].add(2.0)
        scales = jax.random.uniform(ks[1], (1, n, 3), minval=0.02, maxval=0.08)
        q = jax.random.normal(ks[2], (1, n, 4))
        rotations = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        covs = jax.vmap(build_covariance)(scales, rotations)
        sh = jax.random.uniform(ks[3], (1, n, 3, 1))
        opac = jnp.full((1, n), 0.8)
        ext = jnp.eye(4)[None, None]
        K = CAM["intrinsics"][None]
        near = jnp.ones((1, 1))
        far = jnp.full((1, 1), 100.0)
        cfg = DecoderSplattingConfig(
            rasterize=RasterizeConfig(tile_px=8, dup_hw=(4, 4),
                                      max_per_tile=64, chunk=32, tile_group=4)
        )
        g_sr = Gaussians(means, covs, sh, opac, scales, rotations)
        g_cov = Gaussians(means, covs, sh, opac, None, None)
        out_sr = decoder_forward(cfg, g_sr, ext, K, near, far, (32, 32))
        out_cov = decoder_forward(cfg, g_cov, ext, K, near, far, (32, 32))
        np.testing.assert_allclose(out_cov.color, out_sr.color, atol=2e-3)

        # make_scale_invariant path must also agree between the two forms
        cfg_si = DecoderSplattingConfig(
            rasterize=cfg.rasterize, make_scale_invariant=True
        )
        near2 = jnp.full((1, 1), 0.5)
        a = decoder_forward(cfg_si, g_sr, ext, K, near2, far, (32, 32))
        b = decoder_forward(cfg_si, g_cov, ext, K, near2, far, (32, 32))
        np.testing.assert_allclose(b.color, a.color, atol=2e-3)


class TestPruning:
    def test_pruning_transparent_splats_is_exact(self):
        """prune_fraction that removes only fully transparent splats must
        not change the image at all (the rasterizer re-sorts by depth, so
        survivor order is irrelevant)."""
        from vicasplat_tpu.decoder.splatting import (
            DecoderSplattingConfig, decoder_forward, prune_gaussians,
        )
        from vicasplat_tpu.models.adapter import Gaussians

        key = jax.random.PRNGKey(11)
        ks = jax.random.split(key, 4)
        n_vis, n_clear = 24, 8
        n = n_vis + n_clear
        means = jax.random.normal(ks[0], (1, n, 3)) * 0.3
        means = means.at[..., 2].add(2.0)
        scales = jax.random.uniform(ks[1], (1, n, 3), minval=0.02, maxval=0.08)
        q = jax.random.normal(ks[2], (1, n, 4))
        rotations = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        covs = jax.vmap(build_covariance)(scales, rotations)
        sh = jax.random.uniform(ks[3], (1, n, 3, 1))
        opac = jnp.concatenate(
            [jnp.full((1, n_vis), 0.8), jnp.zeros((1, n_clear))], axis=1)
        ext = jnp.eye(4)[None, None]
        K = CAM["intrinsics"][None]
        near, far = jnp.ones((1, 1)), jnp.full((1, 1), 100.0)
        ras = RasterizeConfig(tile_px=8, dup_hw=(4, 4), max_per_tile=64,
                              chunk=32, tile_group=4)
        g = Gaussians(means, covs, sh, opac, scales, rotations)

        ref = decoder_forward(
            DecoderSplattingConfig(rasterize=ras), g, ext, K, near, far,
            (32, 32))
        pruned = decoder_forward(
            DecoderSplattingConfig(rasterize=ras,
                                   prune_fraction=n_clear / n),
            g, ext, K, near, far, (32, 32))
        np.testing.assert_allclose(
            np.asarray(pruned.color), np.asarray(ref.color), atol=1e-6)

        # the prune itself keeps exactly the visible splats
        gp = prune_gaussians(g, n_clear / n)
        assert gp.opacities.shape == (1, n_vis)
        assert float(gp.opacities.min()) > 0.0
        for leaf, orig in ((gp.means, 3), (gp.scales, 3), (gp.rotations, 4)):
            assert leaf.shape == (1, n_vis, orig)

    def test_lane_alignment_at_scale(self):
        """Above 256 splats keep-count snaps to a 128 multiple (TPU lane
        width)."""
        from vicasplat_tpu.decoder.splatting import prune_gaussians
        from vicasplat_tpu.models.adapter import Gaussians

        n = 1000
        g = Gaussians(
            means=jnp.zeros((1, n, 3)), covariances=jnp.zeros((1, n, 3, 3)),
            harmonics=jnp.zeros((1, n, 3, 1)),
            opacities=jnp.linspace(0, 1, n)[None],
            scales=jnp.ones((1, n, 3)), rotations=jnp.ones((1, n, 4)))
        gp = prune_gaussians(g, 0.5)
        assert gp.opacities.shape[1] % 128 == 0
        # survivors are the highest-opacity ones
        assert float(gp.opacities.min()) >= 0.49


class TestWildInputRobustness:
    """Culled splats must not poison the image, whatever their math does.

    Early random-init training emits means at 1e20+ (exp pts3d
    parameterization): the direction-normalization squares overflow f32 to
    inf, and the resulting NaN color survives the compositing matmul even
    at weight 0. The CUDA reference culls before any per-splat math
    (cuda_splatting.py); projection.py's mask + overflow-free norm is our
    equivalent."""

    def test_huge_means_dont_poison_valid_splats(self):
        means, covs, sh, opac = make_scene(jax.random.PRNGKey(3), n=32)
        wild_means = jnp.concatenate(
            [means, jnp.array([[1e23, -3e24, 1e22], [0.0, 0.0, -1e30]])]
        )
        wild_covs = jnp.concatenate([covs, jnp.tile(jnp.eye(3) * 1e-4, (2, 1, 1))])
        wild_sh = jnp.concatenate([sh, jnp.ones((2, 3, 1))])
        wild_opac = jnp.concatenate([opac, jnp.full((2,), 0.9)])
        color, depth, alpha = render(
            wild_means, wild_covs, wild_sh, wild_opac, CAM["extrinsics"],
            CAM["intrinsics"], (32, 32), BG, sh_degree=0, cfg=CFG,
        )
        assert bool(jnp.isfinite(color).all())
        assert bool(jnp.isfinite(alpha).all())
        # and the wild splats changed nothing vs rendering without them
        c_ref, _, a_ref = render(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            (32, 32), BG, sh_degree=0, cfg=CFG,
        )
        np.testing.assert_allclose(color, c_ref, atol=1e-5)
        np.testing.assert_allclose(alpha, a_ref, atol=1e-5)

    def test_gradients_finite_with_wild_means(self):
        means, covs, sh, opac = make_scene(jax.random.PRNGKey(4), n=16)
        means = means.at[0].set(jnp.array([2e22, -1e23, 5e21]))

        def f(m):
            c, _, _ = render(
                m, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
                (32, 32), BG, sh_degree=0, cfg=CFG,
            )
            return jnp.sum(c**2)

        g = jax.grad(f)(means)
        assert bool(jnp.isfinite(g).all())


class TestCoverageWarnings:
    def test_eval_warns_on_overflowing_scene(self, capsys):
        # product-level guard (VERDICT r2 #6): a scene that overflows the
        # per-tile capacity must print an actionable warning and report the
        # fractions in the result
        from vicasplat_tpu.decoder.splatting import (
            DecoderSplattingConfig, coverage_report,
        )
        from vicasplat_tpu.models.adapter import Gaussians

        key = jax.random.PRNGKey(11)
        n = 512
        ks = jax.random.split(key, 3)
        # all splats piled into the same small region -> tile overflow with
        # a tiny max_per_tile; huge covariances -> window truncation
        means = jax.random.normal(ks[0], (1, n, 3)) * 0.02
        means = means.at[..., 2].add(2.0)
        scales = jnp.full((1, n, 3), 0.5)
        rotations = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (1, n, 1))
        sh = jax.random.uniform(ks[1], (1, n, 3, 1))
        g = Gaussians(means, None, sh, jnp.full((1, n), 0.9), scales,
                      rotations)
        cfg = DecoderSplattingConfig(
            rasterize=RasterizeConfig(tile_px=8, dup_hw=(2, 2),
                                      max_per_tile=32, chunk=32, tile_group=4)
        )
        ext = jnp.eye(4)[None, None]
        stats = coverage_report(cfg, g, ext, CAM["intrinsics"][None],
                                (32, 32), tag="overflow-scene")
        out = capsys.readouterr().out
        assert stats["tile_overflow_frac"] > 0.05
        assert "WARNING" in out and "overflow-scene" in out
        assert "max_per_tile" in out or "dup_hw" in out

    def test_no_warning_on_benign_scene(self, capsys):
        from vicasplat_tpu.decoder.splatting import (
            DecoderSplattingConfig, coverage_report,
        )
        from vicasplat_tpu.models.adapter import Gaussians

        means, covs, sh, opac = make_scene(jax.random.PRNGKey(12), n=16)
        scales = jnp.full((16, 3), 0.01)
        rotations = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (16, 1))
        g = Gaussians(means[None], None, sh[None], opac[None],
                      scales[None], rotations[None])
        cfg = DecoderSplattingConfig(
            rasterize=RasterizeConfig(tile_px=8, dup_hw=(4, 4),
                                      max_per_tile=64, chunk=32, tile_group=4)
        )
        stats = coverage_report(cfg, g, jnp.eye(4)[None, None],
                                CAM["intrinsics"][None], (32, 32))
        assert "WARNING" not in capsys.readouterr().out
        assert stats["truncated_frac"] <= 0.05


class TestOriginBinning:
    """bin_splats_origin: sort N once by window-origin tile, bitonic-merge
    each tile's neighbor segments (tiles.py). Must match the dup-sort path
    up to depth-tie ordering (both paths leave ties arbitrary, like the
    reference's unstable CUDA radix sort)."""

    CFG_O = RasterizeConfig(tile_px=8, dup_hw=(4, 4), max_per_tile=64,
                            chunk=32, tile_group=16, binning="origin")

    def test_matches_oracle(self):
        means, covs, sh, opac = make_scene(jax.random.PRNGKey(0))
        shape = (32, 32)
        color, depth, alpha = render(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            shape, BG, sh_degree=0, cfg=self.CFG_O,
        )
        c_ref, d_ref, a_ref = render_view_bruteforce(
            means, covs, sh, opac, jnp.eye(4), CAM["intrinsics"][0],
            shape, BG, sh_degree=0,
        )
        np.testing.assert_allclose(color[0], c_ref, atol=2e-3)
        np.testing.assert_allclose(alpha[0], a_ref, atol=2e-3)
        np.testing.assert_allclose(depth[0], d_ref, atol=2e-2)

    def test_gradients_match_dup_path(self):
        means, covs, sh, opac = make_scene(jax.random.PRNGKey(3), n=96)

        def loss(means, opac, cfg):
            c, d, a = render(
                means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
                (32, 32), BG, sh_degree=0, cfg=cfg,
            )
            return (c ** 2).sum() + d.sum() * 1e-3

        g_dup = jax.grad(loss, argnums=(0, 1))(means, opac, CFG)
        g_org = jax.grad(loss, argnums=(0, 1))(means, opac, self.CFG_O)
        for gd, go in zip(g_dup, g_org):
            assert bool(jnp.isfinite(go).all())
            np.testing.assert_allclose(go, gd, atol=1e-4, rtol=1e-4)

    def test_bitonic_sort_exact(self):
        from vicasplat_tpu.ops.rasterize.tiles import _bitonic_sort_u32

        x = jax.random.bits(
            jax.random.PRNGKey(5), (5, 512), dtype=jnp.uint32
        )  # full u32 range
        got = np.asarray(jax.jit(_bitonic_sort_u32)(x))
        np.testing.assert_array_equal(got, np.sort(np.asarray(x), axis=1))

    def test_tiny_scene(self):
        means, covs, sh, opac = make_scene(jax.random.PRNGKey(2), n=4)
        color, _, alpha = render(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            (32, 32), BG, sh_degree=0, cfg=self.CFG_O,
        )
        assert bool(jnp.isfinite(color).all())

    def test_pallas_bitonic_topk_interpret(self):
        from vicasplat_tpu.ops.rasterize.pallas_bitonic import bitonic_topk_u32

        x = jax.random.bits(jax.random.PRNGKey(9), (130, 256), dtype=jnp.uint32)
        got = np.asarray(
            jax.jit(lambda a: bitonic_topk_u32(a, 64, interpret=True))(x)
        )
        np.testing.assert_array_equal(got, np.sort(np.asarray(x), axis=1)[:, :64])


class TestChunkedOracle:
    def test_chunked_matches_dense(self):
        """The px-chunked oracle (large-scene cap study) is bit-equivalent
        in math to the dense one; only the pixel blocking differs."""
        from vicasplat_tpu.ops.rasterize.reference import (
            render_view_bruteforce_chunked,
        )

        means, covs, sh, opac = make_scene(jax.random.PRNGKey(7), n=96, d_sh=4)
        shape = (24, 40)  # non-square, P=960 not divisible by px_chunk
        args = (means, covs, sh, opac, jnp.eye(4), CAM["intrinsics"][0],
                shape, BG, 1)
        c0, d0, a0 = render_view_bruteforce(*args)
        c1, d1, a1 = render_view_bruteforce_chunked(*args, px_chunk=128)
        np.testing.assert_allclose(c1, c0, atol=1e-6)
        np.testing.assert_allclose(d1, d0, atol=1e-6)
        np.testing.assert_allclose(a1, a0, atol=1e-6)


class TestAdaptiveCaps:
    def test_sparse_scene_keeps_base(self):
        from vicasplat_tpu.ops.rasterize import select_raster_config

        means, covs, sh, opac = make_scene(jax.random.PRNGKey(0), n=32)
        cfg = select_raster_config(
            means, covs, sh, opac, jnp.eye(4), CAM["intrinsics"][0],
            (32, 32), 0, base=CFG,
        )
        assert cfg.dup_hw == CFG.dup_hw
        assert cfg.max_per_tile == CFG.max_per_tile

    def test_dense_scene_escalates(self):
        """A scene of large, heavily-overlapping splats must escalate BOTH
        caps (the reference rasterizer is unbounded — our static caps must
        self-correct rather than silently truncate)."""
        from vicasplat_tpu.ops.rasterize import select_raster_config

        k = jax.random.split(jax.random.PRNGKey(1), 3)
        n = 300
        # all splats piled near the center; 3-sigma footprint ~ 23 px =
        # ~3.9 tiles at tile_px=8 (needs dup 4, inside the choice ladder)
        means = jax.random.normal(k[0], (n, 3)) * 0.02
        means = means.at[:, 2].set(3.0 + means[:, 2])
        covs = jnp.broadcast_to(jnp.eye(3) * 0.15**2, (n, 3, 3))
        sh = jax.random.normal(k[1], (n, 3, 1)) * 0.3
        opac = jnp.full((n,), 0.9)
        base = RasterizeConfig(tile_px=8, dup_hw=(2, 2), max_per_tile=64,
                               chunk=32, tile_group=16)
        cfg = select_raster_config(
            means, covs, sh, opac, jnp.eye(4), CAM["intrinsics"][0],
            (64, 64), 0, base=base,
        )
        assert max(cfg.dup_hw) > 2
        assert cfg.max_per_tile > 64
        # escalated caps render closer to the oracle than the base caps
        c_base, _, _ = render(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            (64, 64), BG, 0, cfg=base)
        c_sel, _, _ = render(
            means, covs, sh, opac, CAM["extrinsics"], CAM["intrinsics"],
            (64, 64), BG, 0, cfg=cfg)
        c_ref, _, _ = render_view_bruteforce(
            means, covs, sh, opac, jnp.eye(4), CAM["intrinsics"][0],
            (64, 64), BG, 0)
        err_base = float(jnp.abs(c_base[0] - c_ref).mean())
        err_sel = float(jnp.abs(c_sel[0] - c_ref).mean())
        assert err_sel <= err_base
        assert err_sel < 2e-3
