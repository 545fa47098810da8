"""Serving engine: shape-cached jitted reconstruction, render, HTTP endpoint."""
import io
import urllib.error
import urllib.request

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_model import tiny_cfg
from vicasplat_tpu.serving import InferenceEngine, serve


def _inputs(B=1, T=3, size=32):
    k = jax.random.PRNGKey(0)
    images = jax.random.uniform(k, (B, T, size, size, 3))
    K = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
        (B, T, 3, 3))
    return images, K


class TestEngine:
    def test_reconstruct_and_render(self):
        cfg = tiny_cfg()
        eng = InferenceEngine(cfg, dtype=jnp.float32)
        images, K = _inputs()
        scene = eng.reconstruct(images, K)
        assert scene.poses.shape == (1, 3, 4, 4)
        np.testing.assert_allclose(
            np.asarray(scene.poses[0, 0]), np.eye(4), atol=1e-6)

        ext = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
        out = eng.render(scene, ext, K[:, :2], (32, 32))
        assert out.color.shape == (1, 2, 32, 32, 3)
        assert bool(jnp.isfinite(out.color).all())

    def test_program_cache_reuse(self):
        cfg = tiny_cfg()
        eng = InferenceEngine(cfg, dtype=jnp.float32)
        images, K = _inputs()
        f1 = eng._reconstruct_fn(tuple(images.shape))
        f2 = eng._reconstruct_fn(tuple(images.shape))
        assert f1 is f2


class TestHTTP:
    def test_reconstruct_endpoint(self):
        cfg = tiny_cfg()
        eng = InferenceEngine(cfg, dtype=jnp.float32)
        srv = serve(eng, port=18744, block=False)
        try:
            images, K = _inputs()
            buf = io.BytesIO()
            np.savez(buf, images=np.asarray(images, np.float32),
                     intrinsics=np.asarray(K, np.float32))
            req = urllib.request.Request(
                "http://127.0.0.1:18744/reconstruct", data=buf.getvalue(),
                method="POST")
            resp = urllib.request.urlopen(req, timeout=60)
            import json
            body = json.loads(resp.read())
            assert body["num_gaussians"] == 3 * 32 * 32
            assert len(body["poses"][0]) == 3
            assert body["latency_s"] > 0
        finally:
            srv.shutdown()
            srv.server_close()

    def test_reconstruct_video_endpoint(self):
        """Long-video route: (F, H, W, 3) frames streamed through sliding
        windows server-side; response carries global poses + window scales."""
        import json

        cfg = tiny_cfg()
        eng = InferenceEngine(cfg, dtype=jnp.float32)
        srv = serve(eng, port=18746, block=False)
        try:
            F = 5
            frames = np.asarray(
                jax.random.uniform(jax.random.PRNGKey(3), (F, 32, 32, 3)),
                np.float32)
            K = np.broadcast_to(
                np.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]],
                         np.float32), (F, 3, 3))
            buf = io.BytesIO()
            np.savez(buf, images=frames, intrinsics=K,
                     window=np.int64(3), overlap=np.int64(1))
            req = urllib.request.Request(
                "http://127.0.0.1:18746/reconstruct_video",
                data=buf.getvalue(), method="POST")
            body = json.loads(urllib.request.urlopen(req, timeout=120).read())
            assert len(body["poses"]) == F
            np.testing.assert_allclose(
                np.asarray(body["poses"][0]), np.eye(4), atol=1e-6)
            assert body["num_gaussians"] == F * 32 * 32
            assert len(body["window_scales"]) == 2
        finally:
            srv.shutdown()
            srv.server_close()

    def test_reconstruct_video_bad_request_is_400(self):
        """Fewer frames than the window must yield a JSON 400, not a dead
        handler thread and a dropped connection."""
        import json

        cfg = tiny_cfg()
        eng = InferenceEngine(cfg, dtype=jnp.float32)
        srv = serve(eng, port=18747, block=False)
        try:
            frames = np.zeros((3, 32, 32, 3), np.float32)  # < window=8
            buf = io.BytesIO()
            np.savez(buf, images=frames)
            req = urllib.request.Request(
                "http://127.0.0.1:18747/reconstruct_video",
                data=buf.getvalue(), method="POST")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=60)
            assert ei.value.code == 400
            assert "need >=" in json.loads(ei.value.read())["error"]
        finally:
            srv.shutdown()
            srv.server_close()

    def test_reconstruct_endpoint_jpeg(self):
        """Compressed request: concatenated JPEG frames + sizes + (B, T)."""
        import json

        from PIL import Image

        cfg = tiny_cfg()
        eng = InferenceEngine(cfg, dtype=jnp.float32)
        srv = serve(eng, port=18745, block=False)
        try:
            images, K = _inputs()
            u8 = np.asarray(images * 255, np.uint8).reshape(-1, 32, 32, 3)
            frames = []
            for f in u8:
                b = io.BytesIO()
                Image.fromarray(f, "RGB").save(b, "JPEG", quality=95)
                frames.append(np.frombuffer(b.getvalue(), np.uint8))
            buf = io.BytesIO()
            np.savez(
                buf,
                jpeg_data=np.concatenate(frames),
                jpeg_sizes=np.array([len(f) for f in frames], np.int64),
                batch_shape=np.array(images.shape[:2], np.int64),
                intrinsics=np.asarray(K, np.float32),
            )
            req = urllib.request.Request(
                "http://127.0.0.1:18745/reconstruct", data=buf.getvalue(),
                method="POST")
            body = json.loads(urllib.request.urlopen(req, timeout=60).read())
            assert body["num_gaussians"] == 3 * 32 * 32
            assert len(body["poses"][0]) == 3
        finally:
            srv.shutdown()
            srv.server_close()


class TestViewMesh:
    def test_render_with_view_mesh_matches_serial(self):
        from vicasplat_tpu.parallel import make_mesh

        cfg = tiny_cfg()
        images, K = _inputs()
        serial = InferenceEngine(cfg, dtype=jnp.float32)
        sharded = InferenceEngine(
            cfg, params=serial.params, dtype=jnp.float32,
            view_mesh=make_mesh(),
        )
        scene = serial.reconstruct(images, K)
        V = 12  # pads to 16 on the 8-device mesh
        ext = jnp.broadcast_to(jnp.eye(4), (1, V, 4, 4))
        Kv = jnp.broadcast_to(K[:, :1], (1, V, 3, 3))
        ref = serial.render(scene, ext, Kv, (32, 32))
        got = sharded.render(scene, ext, Kv, (32, 32))
        assert got.color.shape == ref.color.shape
        np.testing.assert_allclose(
            np.asarray(ref.color), np.asarray(got.color), atol=1e-5)


class TestAdaptiveCaps:
    def test_render_selects_and_caches_scene_caps(self):
        """adaptive_caps=True: the first render probes the scene and pins a
        RasterizeConfig on the SceneBatch; renders stay finite and correct
        shape; repeated renders reuse the cached selection (one recompile
        per distinct config, not per call)."""
        cfg = tiny_cfg()
        eng = InferenceEngine(cfg, dtype=jnp.float32, adaptive_caps=True)
        images, K = _inputs()
        scene = eng.reconstruct(images, K)
        assert scene.raster_cfg is None
        ext = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
        out = eng.render(scene, ext, K[:, :2], (32, 32))
        assert scene.raster_cfg is not None
        assert out.color.shape == (1, 2, 32, 32, 3)
        assert bool(jnp.isfinite(out.color).all())
        sel1 = scene.raster_cfg
        eng.render(scene, ext, K[:, :2], (32, 32))
        assert scene.raster_cfg is sel1  # probe ran once per scene

    def test_dense_scene_flips_to_larger_config(self):
        """A dense SceneBatch (fat overlapping splats) escalates the caps
        while a sparse one keeps the base — the adaptive escape hatch the
        static caps need (reference rasterizer is unbounded)."""
        import dataclasses as dc

        from vicasplat_tpu.models.adapter import Gaussians
        from vicasplat_tpu.ops.rasterize import RasterizeConfig
        from vicasplat_tpu.serving import SceneBatch

        cfg = tiny_cfg()
        base = RasterizeConfig(tile_px=8, dup_hw=(2, 2), max_per_tile=64,
                               chunk=32, tile_group=16)
        eng = InferenceEngine(
            cfg, dtype=jnp.float32, adaptive_caps=True,
            decoder=dc.replace(InferenceEngine(cfg).dec_cfg, rasterize=base))
        k = jax.random.split(jax.random.PRNGKey(3), 3)
        n = 300
        means = (jax.random.normal(k[0], (1, n, 3)) * 0.02
                 + jnp.array([0.0, 0.0, 3.0]))
        g = Gaussians(
            means=means, covariances=None,
            harmonics=jax.random.normal(k[1], (1, n, 3, 1)) * 0.3,
            opacities=jnp.full((1, n), 0.9),
            scales=jnp.full((1, n, 3), 0.15),
            rotations=jnp.broadcast_to(
                jnp.array([1.0, 0.0, 0.0, 0.0]), (1, n, 4)),
        )
        ext = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
        K = jnp.broadcast_to(
            jnp.array([[1.2, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]]),
            (1, 1, 3, 3))
        dense = SceneBatch(gaussians=g, poses=ext, intrinsics=K)
        eng.render(dense, ext, K, (64, 64))
        assert max(dense.raster_cfg.dup_hw) > 2
        assert dense.raster_cfg.max_per_tile > 64

        # genuinely sparse: tiny splats SPREAD across the image plane (the
        # first attempt only spread them in depth — they all projected into
        # the center tile and K correctly escalated)
        sp = jax.random.uniform(k[2], (1, n, 2), minval=-1.2, maxval=1.2)
        sparse_means = jnp.concatenate(
            [sp * g.means[..., 2:3], g.means[..., 2:3]], axis=-1)
        sparse_g = g._replace(scales=jnp.full((1, n, 3), 0.01),
                              means=sparse_means)
        sparse = SceneBatch(gaussians=sparse_g, poses=ext, intrinsics=K)
        eng.render(sparse, ext, K, (64, 64))
        assert sparse.raster_cfg.dup_hw == (2, 2)
        assert sparse.raster_cfg.max_per_tile == 64
