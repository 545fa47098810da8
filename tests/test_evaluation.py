"""Tests for evaluation tooling: epipolar overlap, index generation/extension,
metric computer, video rendering, orthographic projections."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vicasplat_tpu.geometry.epipolar import view_overlap_fraction
from vicasplat_tpu.models.adapter import Gaussians, build_covariance


def look_at_x(offset):
    """Camera at x=offset looking down +z."""
    m = np.eye(4, dtype=np.float32)
    m[0, 3] = offset
    return jnp.asarray(m)


K = jnp.asarray(np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32))


class TestEpipolarOverlap:
    def test_identical_cameras_full_overlap(self):
        ov = view_overlap_fraction(look_at_x(0), K, look_at_x(0), K)
        assert float(ov) > 0.99

    def test_small_shift_high_overlap(self):
        ov = view_overlap_fraction(look_at_x(0), K, look_at_x(0.1), K)
        assert float(ov) > 0.8

    def test_opposite_directions_low_overlap(self):
        flip = np.eye(4, dtype=np.float32)
        flip[0, 0] = flip[2, 2] = -1  # rotate 180 degrees about y
        flip[0, 3] = 50.0             # and far away
        ov = view_overlap_fraction(look_at_x(0), K, jnp.asarray(flip), K)
        assert float(ov) < 0.5


class TestIndexGenerator:
    def test_finds_pair_in_overlap_band(self):
        from vicasplat_tpu.evaluation.index_generator import (
            EvaluationIndexGenerator,
            IndexGeneratorConfig,
        )

        v = 30
        # panning camera: rotation reduces epipolar overlap with distance
        # (pure translation keeps ray overlap ~1 — rays re-enter the frustum)
        ext = np.zeros((v, 4, 4), np.float32)
        for i in range(v):
            ang = i * 0.06
            c, s = np.cos(ang), np.sin(ang)
            ext[i] = np.array([
                [c, 0, s, i * 0.02], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]
            ], np.float32)
        intr = np.tile(np.asarray(K), (v, 1, 1))
        gen = EvaluationIndexGenerator(IndexGeneratorConfig(
            num_target_views=3, min_distance=5, max_distance=25,
            min_overlap=0.3, max_overlap=0.95,
        ))
        entry = gen.process_scene("scene0", ext, intr)
        assert entry is not None
        left, right = entry.context
        assert right - left >= 5
        assert all(left <= t <= right for t in entry.target)
        assert 0.3 <= entry.overlap <= 0.95

    def test_save(self, tmp_path):
        from vicasplat_tpu.evaluation.index_generator import (
            EvaluationIndexGenerator,
            IndexGeneratorConfig,
        )

        gen = EvaluationIndexGenerator(
            IndexGeneratorConfig(output_path=str(tmp_path))
        )
        gen.index = {"a": None}
        path = gen.save()
        assert json.loads(path.read_text()) == {"a": None}


class TestExtendIndex:
    def test_extend_entry(self):
        from vicasplat_tpu.evaluation.extend_index import extend_entry

        rng = np.random.default_rng(0)
        out = extend_entry(
            {"context": [10, 40]}, n_total_views=100, n_context=4,
            n_target=3, rng=rng,
        )
        ctx = out["context"]
        assert len(ctx) == 4
        assert ctx[1] - ctx[0] == 30
        assert len(out["target"]) == 3
        assert all(ctx[0] <= t <= ctx[-1] for t in out["target"])

    def test_extend_clamps_to_scene_length(self):
        from vicasplat_tpu.evaluation.extend_index import extend_entry

        rng = np.random.default_rng(0)
        out = extend_entry(
            {"context": [0, 60]}, n_total_views=50, n_context=8,
            n_target=3, rng=rng,
        )
        assert out["context"][-1] < 50

    def test_scene_dirs_cli(self, tmp_path):
        """--scene_dirs mode reads scene length from extrinsics.npy
        (reference generate_eval_index_scannet.py:31-71 layout)."""
        from vicasplat_tpu.evaluation.extend_index import main

        data_root = tmp_path / "scannet"
        for scene, n_frames in [("scene0000_00", 90), ("scene0001_00", 40)]:
            d = data_root / scene
            d.mkdir(parents=True)
            np.save(d / "extrinsics.npy",
                    np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1)))
        # a dir with no extrinsics.npy and an unindexed dir must be skipped
        (data_root / "scene0002_00").mkdir()
        idx_path = tmp_path / "index_2v.json"
        idx_path.write_text(json.dumps({
            "scene0000_00": {"context": [5, 15], "target": [10]},
            "scene0002_00": {"context": [0, 10], "target": [5]},
            "scene_missing": {"context": [0, 10], "target": [5]},
        }))
        out_path = tmp_path / "index_8v.json"
        main([
            "--scene_dirs", "--index_2v", str(idx_path),
            "--data_root", str(data_root),
            "--n_context", "8", "--n_target", "4",
            "--output", str(out_path),
        ])
        out = json.loads(out_path.read_text())
        assert set(out) == {"scene0000_00"}
        ctx = out["scene0000_00"]["context"]
        assert len(ctx) == 8 and ctx[-1] < 90
        assert ctx[1] - ctx[0] == 10  # 2-view interval reused as frame gap


class TestMetricComputer:
    def test_scores_and_buckets(self, tmp_path):
        from vicasplat_tpu.evaluation.metric_computer import (
            MetricComputer,
            MetricComputerConfig,
            get_overlap_tag,
        )
        from vicasplat_tpu.utils.image_io import save_image

        rng = np.random.default_rng(0)
        gt_dir = tmp_path / "gt"
        m_dir = tmp_path / "method"
        for i in range(2):
            img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
            save_image(img, gt_dir / f"{i:03d}.png")
            save_image(np.clip(img + 0.01, 0, 1), m_dir / f"{i:03d}.png")
        mc = MetricComputer(MetricComputerConfig(output_path=str(tmp_path / "out")))
        entry = mc.score_scene("ours", "scene0", m_dir, gt_dir, overlap=0.25)
        assert entry["psnr"] > 30
        summary = mc.summary()
        assert "ours/all" in summary and "ours/small" in summary
        assert get_overlap_tag(0.25) == "small"
        assert get_overlap_tag(0.5) == "medium"
        assert get_overlap_tag(0.7) == "large"
        assert get_overlap_tag(0.95) is None
        mc.dump()
        assert (tmp_path / "out" / "metrics.json").exists()


def tiny_gaussians(n=32, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    means = jax.random.uniform(ks[0], (1, n, 3), minval=-0.5, maxval=0.5)
    means = means.at[..., 2].add(2.0)
    scales = jax.random.uniform(ks[1], (1, n, 3), minval=0.05, maxval=0.15)
    quats = jax.random.normal(ks[2], (1, n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    return Gaussians(
        means=means,
        covariances=build_covariance(scales, quats),
        harmonics=jax.random.normal(ks[3], (1, n, 3, 1)) * 0.3,
        opacities=jax.random.uniform(ks[4], (1, n), minval=0.4, maxval=0.9),
        scales=scales,
        rotations=quats,
    )


RC = dict(tile_px=8, dup_hw=(2, 2), max_per_tile=32, chunk=32, tile_group=4)


class TestVideoRender:
    def test_interpolation_video(self):
        from vicasplat_tpu.decoder.splatting import DecoderSplattingConfig
        from vicasplat_tpu.ops.rasterize import RasterizeConfig
        from vicasplat_tpu.visualization.video_render import (
            render_video_interpolation,
            render_video_wobble,
        )

        g = tiny_gaussians()
        ext = jnp.stack([jnp.eye(4), jnp.eye(4).at[0, 3].set(0.2)])
        intr = jnp.broadcast_to(K, (2, 3, 3))
        cfg = DecoderSplattingConfig(rasterize=RasterizeConfig(**RC))
        video = render_video_interpolation(g, ext, intr, (16, 16), 3, cfg)
        assert video.shape == (4, 16, 16, 3)
        assert np.isfinite(video).all()
        wob = render_video_wobble(g, ext, intr, (16, 16), 4, cfg)
        assert wob.shape == (4, 16, 16, 3)


class TestValidationIn3D:
    def test_render_projections(self):
        from vicasplat_tpu.decoder.splatting import DecoderSplattingConfig
        from vicasplat_tpu.ops.rasterize import RasterizeConfig
        from vicasplat_tpu.visualization.validation_in_3d import (
            render_projections,
        )

        g = tiny_gaussians()
        cfg = DecoderSplattingConfig(rasterize=RasterizeConfig(**RC))
        imgs = render_projections(g, resolution=16, dec_cfg=cfg)
        assert imgs.shape == (3, 16, 16, 3)
        assert np.isfinite(imgs).all()
        # something should actually be visible in each projection
        assert (imgs.reshape(3, -1).max(axis=1) > 0.01).all()


class TestDrawing:
    def test_cameras_figure(self):
        from vicasplat_tpu.visualization.drawing import draw_cameras_figure

        ext = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        ext[:, 0, 3] = [0, 0.5, 1.0]
        img = draw_cameras_figure(ext, ext + 0.01)
        assert img.ndim == 3 and img.shape[2] == 3

    def test_points_and_lines(self):
        from vicasplat_tpu.visualization.drawing import draw_line, draw_points

        img = np.zeros((32, 32, 3), np.float32)
        img = draw_points(img, np.array([[0.5, 0.5]]), color=(1, 0, 0))
        assert img[16, 16, 0] == 1.0
        img = draw_line(img, (0.0, 0.0), (1.0, 1.0), color=(0, 1, 0))
        assert img[8, 8, 1] == 1.0


class TestLayout:
    def test_hcat_vcat_label(self):
        from vicasplat_tpu.visualization.layout import add_label, hcat, vcat

        a = np.zeros((8, 10, 3), np.float32)
        b = np.ones((12, 6, 3), np.float32)
        h = hcat(a, b)
        assert h.shape == (12, 16, 3)
        v = vcat(a, b)
        assert v.shape == (20, 10, 3)
        lab = add_label(a, "test")
        assert lab.shape[1] == 10 and lab.shape[0] > 8


class TestAlignObjective:
    """Pose-alignment loss follows the configured experiment losses minus
    camera (reference model_wrapper.py:485-489), with a documented SSIM
    fallback when LPIPS weights are unavailable."""

    def _imgs(self):
        import jax
        import jax.numpy as jnp

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        return (jax.random.uniform(k1, (1, 2, 16, 16, 3)),
                jax.random.uniform(k2, (1, 2, 16, 16, 3)))

    def test_protocol_mse_only(self):
        import numpy as np

        from vicasplat_tpu.evaluation.nvs_eval import make_align_objective
        from vicasplat_tpu.utils.config import LossWeightsConfig
        from vicasplat_tpu.loss.losses import LossMseConfig

        cfg = LossWeightsConfig(mse=LossMseConfig(weight=2.0), lpips=None)
        fn, mode = make_align_objective(cfg, lpips_fn=None)
        assert mode == "mse"
        pred, tgt = self._imgs()
        np.testing.assert_allclose(
            float(fn(pred, tgt)), 2.0 * float(((pred - tgt) ** 2).mean()),
            rtol=1e-6)

    def test_protocol_mse_plus_lpips(self):
        import jax.numpy as jnp
        import numpy as np

        from vicasplat_tpu.evaluation.nvs_eval import make_align_objective
        from vicasplat_tpu.utils.config import LossWeightsConfig
        from vicasplat_tpu.loss.losses import LossLpipsConfig, LossMseConfig

        cfg = LossWeightsConfig(
            mse=LossMseConfig(weight=1.0),
            lpips=LossLpipsConfig(weight=0.05),
        )
        stub = lambda a, b: jnp.float32(0.5)
        fn, mode = make_align_objective(cfg, lpips_fn=stub)
        assert mode == "mse+lpips"
        pred, tgt = self._imgs()
        np.testing.assert_allclose(
            float(fn(pred, tgt)),
            float(((pred - tgt) ** 2).mean()) + 0.05 * 0.5,
            rtol=1e-6)

    def test_fallback_when_lpips_unavailable(self):
        from vicasplat_tpu.evaluation.nvs_eval import make_align_objective
        from vicasplat_tpu.utils.config import LossWeightsConfig
        from vicasplat_tpu.loss.losses import LossLpipsConfig, LossMseConfig

        cfg = LossWeightsConfig(
            mse=LossMseConfig(), lpips=LossLpipsConfig()
        )
        _, mode = make_align_objective(cfg, lpips_fn=None)
        assert mode == "ssim_fallback"
        _, mode2 = make_align_objective(None, None)
        assert mode2 == "ssim_fallback"
