"""AOT export: serialized StableHLO artifacts reproduce the live engine
bit-for-bit and deserialize without touching engine/model state."""
import jax
import jax.numpy as jnp
import numpy as np

from tests.test_model import tiny_cfg
from vicasplat_tpu.export import (
    export_reconstruct, export_render, load_exported, save_exported,
)
from vicasplat_tpu.serving import InferenceEngine


def _inputs(B=1, T=3, size=32):
    k = jax.random.PRNGKey(0)
    images = jax.random.uniform(k, (B, T, size, size, 3))
    K = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
        (B, T, 3, 3))
    return images, K


class TestExport:
    def test_reconstruct_roundtrip(self, tmp_path):
        cfg = tiny_cfg()
        eng = InferenceEngine(cfg, dtype=jnp.float32)
        images, K = _inputs()

        blob = export_reconstruct(eng, 1, 3, 32, 32, with_intrinsics=True)
        save_exported(tmp_path / "reconstruct.shlo", blob)

        live = eng.reconstruct(images, K)
        exp = load_exported(tmp_path / "reconstruct.shlo")
        out = exp.call(eng.params, images, K)
        assert set(out["gaussians"]) == {
            "means", "covariances", "harmonics", "opacities", "scales",
            "rotations"}
        np.testing.assert_array_equal(
            np.asarray(out["poses"]), np.asarray(live.poses))
        np.testing.assert_array_equal(
            np.asarray(out["gaussians"]["means"]),
            np.asarray(live.gaussians.means))

    def test_render_roundtrip(self, tmp_path):
        cfg = tiny_cfg()
        eng = InferenceEngine(cfg, dtype=jnp.float32)
        images, K = _inputs()
        scene = eng.reconstruct(images, K)

        blob = export_render(eng, scene.gaussians.opacities.shape, 2, (32, 32))
        save_exported(tmp_path / "render.shlo", blob)

        ext = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)).astype(jnp.float32)
        near = jnp.full((1, 2), 0.05)
        far = jnp.full((1, 2), 100.0)
        live = eng.render(scene, ext, K[:, :2], (32, 32))

        g_dict = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32), dict(scene.gaussians._asdict()))
        exp = load_exported(tmp_path / "render.shlo")
        out = exp.call(g_dict, ext, jnp.asarray(K[:, :2], jnp.float32),
                       near, far)
        assert set(out) == {"color", "depth", "alpha"}
        np.testing.assert_allclose(
            np.asarray(out["color"]), np.asarray(live.color), atol=1e-6)

    def test_quantized_engine_exports(self, tmp_path):
        # int8 dot_generals serialize like any other StableHLO op; the
        # artifact carries the quantized calling convention transparently
        cfg = tiny_cfg()
        eng = InferenceEngine(cfg, dtype=jnp.float32, quantize=True, quantize_min_size=1)
        assert eng.n_quantized > 0
        images, K = _inputs()
        blob = export_reconstruct(eng, 1, 3, 32, 32, with_intrinsics=True)
        p = tmp_path / "q.shlo"
        save_exported(p, blob)
        live = eng.reconstruct(images, K)
        out = load_exported(p).call(eng.params, images, K)
        np.testing.assert_array_equal(
            np.asarray(out["gaussians"]["means"]),
            np.asarray(live.gaussians.means))

    def test_artifact_is_self_contained(self, tmp_path):
        # deserialization must not need the engine: only the params pytree
        cfg = tiny_cfg()
        eng = InferenceEngine(cfg, dtype=jnp.float32)
        images, K = _inputs()
        blob = export_reconstruct(eng, 1, 3, 32, 32, with_intrinsics=True)
        p = tmp_path / "r.shlo"
        save_exported(p, blob)
        params = eng.params
        del eng
        out = load_exported(p).call(params, images, K)
        assert np.isfinite(np.asarray(out["gaussians"]["means"])).all()
