"""End-to-end on the REAL bundled RE10K frames (the reference ships two
8-frame scenes at examples/ — SURVEY.md §4 calls them the natural e2e
fixtures; reference demo.py:85-132 is the loading contract).

The flagship-size run lives in outputs/real_scene_demo (driven on TPU);
this test keeps the pipeline honest on CPU with a small model: real PNGs
-> demo.load_images -> vicasplat_forward -> finite Gaussians +
non-degenerate poses."""
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SCENE = pathlib.Path("/root/reference/examples/6c99592614256138")

pytestmark = pytest.mark.skipif(
    not SCENE.exists(), reason="bundled example scenes not present"
)


@pytest.fixture(scope="module")
def real_frames():
    # import the REPO's demo.py by path: ref_shims puts /root/reference
    # (which ships its own demo.py) at sys.path[0], so a bare
    # `import demo` resolves to the reference's gradio demo when the
    # parity tests run first in the same session
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "vicasplat_tpu_demo", pathlib.Path(__file__).parents[1] / "demo.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.load_images(SCENE, size=64)


class TestRealScene:
    def test_load_images_contract(self, real_frames):
        # 8 frames, short side resized + center-cropped square, [0,1]
        assert real_frames.shape == (8, 64, 64, 3)
        assert real_frames.dtype == np.float32
        assert 0.0 <= real_frames.min() and real_frames.max() <= 1.0
        assert real_frames.std() > 0.05  # actual image content, not blank
        # frames differ (it's video, not a repeated still)
        assert np.abs(real_frames[0] - real_frames[-1]).mean() > 0.01

    def test_forward_finite_and_nondegenerate(self, real_frames):
        from tests.test_model import tiny_cfg
        from vicasplat_tpu.models import init_vicasplat, vicasplat_forward

        import dataclasses

        cfg = tiny_cfg(T=8)
        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone, img_size=64)
        )
        params = init_vicasplat(jax.random.PRNGKey(0), cfg)
        # the camera head is zero-init (identity poses by construction);
        # perturb it so the dq-normalize -> SE(3) path is actually
        # exercised on real data rather than trivially emitting identity
        params["camera_extrinsic_head"] = jax.tree.map(
            lambda p: jax.random.normal(jax.random.PRNGKey(1), p.shape) * 0.1,
            params["camera_extrinsic_head"],
        )
        f = 0.5 / np.tan(np.radians(60.0) / 2)
        K = jnp.broadcast_to(
            jnp.array([[f, 0, 0.5], [0, f, 0.5], [0, 0, 1.0]]), (1, 8, 3, 3)
        )
        batch = {
            "image": jnp.asarray(real_frames)[None] * 2 - 1,
            "intrinsics": K,
        }
        out = vicasplat_forward(params, cfg, batch)
        g = out["gaussians"]
        for name, leaf in g._asdict().items():
            if leaf is not None:
                assert bool(jnp.isfinite(leaf).all()), f"non-finite {name}"
        assert bool((g.opacities >= 0).all() and (g.opacities <= 1).all())
        assert bool((g.scales > 0).all())

        poses = np.asarray(out["gaussian_camera_extrins"][0])  # (8, 4, 4)
        assert np.isfinite(poses).all()
        # frame 0 is pinned to identity (reference vicasplat.py:193-199)
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
        # valid rigid transforms: R orthonormal, det +1
        R = poses[:, :3, :3]
        np.testing.assert_allclose(
            R @ np.swapaxes(R, -1, -2),
            np.broadcast_to(np.eye(3), R.shape),
            atol=1e-5,
        )
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
        # non-identity-collapsed: the perturbed head must move frames 1..7
        assert np.abs(poses[1:] - np.eye(4)).max() > 1e-3


class TestRealSceneStreaming:
    def test_streamed_long_video(self, real_frames):
        """The 8 real frames streamed as 5-frame windows with 2-frame
        overlap: the seam math must produce valid rigid global poses and
        one Gaussian layer per frame (demo.py --window path)."""
        import dataclasses

        from tests.test_model import tiny_cfg
        from vicasplat_tpu.serving import InferenceEngine
        from vicasplat_tpu.streaming import reconstruct_video

        cfg = tiny_cfg(T=5)
        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone, img_size=64)
        )
        eng = InferenceEngine(cfg, dtype=jnp.float32)
        # perturb the zero-init camera head so window poses are non-trivial
        eng.params["camera_extrinsic_head"] = jax.tree.map(
            lambda p: jax.random.normal(jax.random.PRNGKey(1), p.shape,
                                        p.dtype) * 0.1,
            eng.params["camera_extrinsic_head"],
        )
        f = 0.5 / np.tan(np.radians(60.0) / 2)
        K = np.broadcast_to(
            np.array([[f, 0, 0.5], [0, f, 0.5], [0, 0, 1.0]]), (8, 3, 3))
        scene = reconstruct_video(eng, real_frames, K, window=5, overlap=2)
        assert scene.poses.shape == (8, 4, 4)
        np.testing.assert_allclose(scene.poses[0], np.eye(4), atol=1e-6)
        R = scene.poses[:, :3, :3]
        np.testing.assert_allclose(
            R @ np.swapaxes(R, -1, -2),
            np.broadcast_to(np.eye(3), R.shape), atol=1e-4)
        assert scene.gaussians.means.shape[0] == 8
        assert np.isfinite(np.asarray(scene.gaussians.means)).all()
        assert (scene.window_scales > 0).all()
