"""Synthetic multi-scene pose dataset: determinism, camera conventions,
parallax signal, and DataModule integration."""
import numpy as np

from vicasplat_tpu.data.synthetic_scenes import (
    DatasetSyntheticScenes,
    SyntheticScenesConfig,
    generate_scene,
    intrinsics_for,
    scene_trajectory,
)

TINY = SyntheticScenesConfig(
    n_scenes=2, n_val_scenes=1, n_test_scenes=2, n_frames=4,
    input_image_shape=(16, 16), n_gaussians=160, n_clusters=6,
)


class TestGenerator:
    def test_deterministic(self):
        a = generate_scene(3, TINY)
        b = generate_scene(3, TINY)
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["extrinsics"], b["extrinsics"])

    def test_distinct_scenes(self):
        a = generate_scene(0, TINY)
        b = generate_scene(1, TINY)
        assert np.abs(a["images"] - b["images"]).max() > 0.05

    def test_frames_have_parallax(self):
        sc = generate_scene(0, TINY)
        imgs = sc["images"]
        assert imgs.shape == (4, 16, 16, 3)
        assert np.isfinite(imgs).all()
        # camera moves -> consecutive frames differ
        assert np.abs(imgs[0] - imgs[-1]).mean() > 1e-3
        # frames are textured, not flat
        assert imgs[0].std() > 0.02

    def test_trajectory_nondegenerate_se3(self):
        rng = np.random.default_rng(0)
        poses = scene_trajectory(rng, TINY)
        R = poses[:, :3, :3]
        # orthonormal rotations, det +1
        for r in R:
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
            assert np.linalg.det(r) > 0.99
        # non-trivial translation AND rotation between endpoints
        assert np.linalg.norm(poses[-1, :3, 3] - poses[0, :3, 3]) > 0.05
        rel = np.linalg.inv(poses[0]) @ poses[-1]
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(rel[:3, :3]) - 1) / 2, -1, 1)))
        assert ang > 0.5


class _AllSampler:
    def sample(self, scene, n, rng):
        idx = np.arange(n)
        return idx[: n - 1], idx[n - 1:], None


class TestDataset:
    def test_example_contract_and_conventions(self):
        ds = DatasetSyntheticScenes(TINY, "test", _AllSampler(), seed=0)
        ex = ds._example(ds.ids[0])
        ctx = ex["context"]
        assert ctx["image"].shape == (3, 16, 16, 3)
        assert ctx["extrinsics"].shape == (3, 4, 4)
        # frame-0-relative poses
        np.testing.assert_allclose(ctx["extrinsics"][0], np.eye(4), atol=1e-6)
        # baseline-1: first-to-last context translation norm == 1
        d = np.linalg.norm(ctx["extrinsics"][-1][:3, 3]
                           - ctx["extrinsics"][0][:3, 3])
        np.testing.assert_allclose(d, 1.0, rtol=1e-5)
        assert ex["scene"].startswith("synthetic_")

    def test_stage_splits_disjoint(self):
        tr = DatasetSyntheticScenes(TINY, "train", _AllSampler(), seed=0)
        te = DatasetSyntheticScenes(TINY, "test", _AllSampler(), seed=0)
        va = DatasetSyntheticScenes(TINY, "val", _AllSampler(), seed=0)
        assert not (set(tr.ids) & set(te.ids))
        assert not (set(tr.ids) & set(va.ids))
        assert not (set(va.ids) & set(te.ids))
        assert len(te.ids) == 2

    def test_data_module_integration(self):
        from vicasplat_tpu.data.data_module import DataModule

        dm = DataModule(
            {"synthetic": {
                "name": "synthetic", "n_scenes": 2, "n_val_scenes": 1,
                "n_test_scenes": 1, "n_frames": 4,
                "input_image_shape": [16, 16], "n_gaussians": 160,
                "n_clusters": 6,
                "view_sampler": {
                    "name": "sequential", "num_context_views": 2,
                    "num_target_views": 1,
                    "min_distance_between_context_views": 1,
                    "max_distance_between_context_views": 2,
                },
            }},
            {"test": {"batch_size": 1}},
        )
        loader = dm.test_dataloader()
        batch = next(iter(loader))
        assert batch["context"]["image"].shape == (1, 2, 16, 16, 3)
        # test-stage sequential sampler targets the full context span
        assert batch["target"]["image"].shape[:2] == (1, 3)
        loader.close()
