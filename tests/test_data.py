"""Data-pipeline tests against a synthetic chunk in the pixelSplat format."""
import io
import json

import numpy as np
import pytest

from vicasplat_tpu.data import DataModule
from vicasplat_tpu.data.dataset_re10k import (
    DatasetRE10k,
    DatasetRE10kConfig,
    convert_poses,
)
from vicasplat_tpu.data.shims import apply_crop_shim, reflect_views
from vicasplat_tpu.data.view_samplers import (
    ViewSamplerBoundedConfig,
    ViewSamplerSequentialConfig,
    make_view_sampler,
)
from vicasplat_tpu.utils.step_tracker import StepTracker

torch = pytest.importorskip("torch")
from PIL import Image  # noqa: E402


def make_chunk(tmp_path, n_scenes=2, n_views=40, hw=(288, 384)):
    """Write a synthetic .torch chunk + index.json like the reference format."""
    rng = np.random.default_rng(0)
    chunk = []
    for s in range(n_scenes):
        images = []
        for v in range(n_views):
            arr = (rng.uniform(size=(*hw, 3)) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            images.append(torch.frombuffer(
                bytearray(buf.getvalue()), dtype=torch.uint8))
        cams = np.zeros((n_views, 18), np.float32)
        cams[:, 0] = 0.9   # fx
        cams[:, 1] = 1.2   # fy
        cams[:, 2] = 0.5   # cx
        cams[:, 3] = 0.5   # cy
        # w2c rows: identity rotation, camera moving along +x
        for v in range(n_views):
            w2c = np.eye(4, dtype=np.float32)
            w2c[0, 3] = -0.05 * v
            cams[v, 6:] = w2c[:3].reshape(-1)
        chunk.append({
            "key": f"scene{s}",
            "cameras": torch.from_numpy(cams),
            "images": images,
            "url": "", "timestamps": torch.arange(n_views),
        })
    stage_dir = tmp_path / "train"
    stage_dir.mkdir(parents=True)
    torch.save(chunk, stage_dir / "000000.torch")
    with open(stage_dir / "index.json", "w") as f:
        json.dump({c["key"]: "000000.torch" for c in chunk}, f)
    # test stage mirrors train for this fixture
    test_dir = tmp_path / "test"
    test_dir.mkdir()
    torch.save(chunk, test_dir / "000000.torch")
    with open(test_dir / "index.json", "w") as f:
        json.dump({c["key"]: "000000.torch" for c in chunk}, f)
    return tmp_path


class TestConvertPoses:
    def test_roundtrip(self):
        cams = np.zeros((3, 18), np.float32)
        cams[:, :4] = [0.9, 1.2, 0.5, 0.5]
        w2c = np.eye(4, dtype=np.float32)
        w2c[0, 3] = 2.0
        for v in range(3):
            cams[v, 6:] = w2c[:3].reshape(-1)
        c2w, K = convert_poses(cams)
        np.testing.assert_allclose(c2w[0], np.linalg.inv(w2c), atol=1e-6)
        assert K[0, 0, 0] == np.float32(0.9)


class TestSamplers:
    def test_sequential_spacing(self):
        cfg = ViewSamplerSequentialConfig(
            num_context_views=4, num_target_views=6,
            min_distance_between_context_views=3,
            max_distance_between_context_views=6,
        )
        s = make_view_sampler(cfg, "train")
        rng = np.random.default_rng(0)
        ctx, tgt, _ = s.sample("x", 40, rng)
        assert len(ctx) == 4
        gaps = np.diff(np.sort(ctx))
        assert (gaps == gaps[0]).all()
        assert 3 <= abs(gaps[0]) <= 6
        assert len(tgt) == 6

    def test_sequential_test_stage_deterministic(self):
        cfg = ViewSamplerSequentialConfig(
            num_context_views=4, num_target_views=6,
            min_distance_between_context_views=3,
            max_distance_between_context_views=5,
        )
        s = make_view_sampler(cfg, "test")
        ctx, tgt, _ = s.sample("x", 40, np.random.default_rng(0))
        assert ctx[0] == 0
        assert (np.diff(ctx) == 5).all()
        # test picks ALL frames in the span as targets
        assert len(tgt) == ctx[-1] + 1

    def test_bounded_curriculum(self):
        st = StepTracker()
        cfg = ViewSamplerBoundedConfig(
            num_context_views=2, num_target_views=2,
            min_distance_between_context_views=20,
            max_distance_between_context_views=20,
            initial_min_distance_between_context_views=5,
            initial_max_distance_between_context_views=5,
            warm_up_steps=100,
        )
        s = make_view_sampler(cfg, "train", step_tracker=st)
        rng = np.random.default_rng(0)
        st.set_step(0)
        ctx0, _, _ = s.sample("x", 60, rng)
        assert abs(ctx0[1] - ctx0[0]) == 5
        st.set_step(1000)
        ctx1, _, _ = s.sample("x", 60, rng)
        assert abs(ctx1[1] - ctx1[0]) == 20

    def test_sampler_from_dict(self):
        s = make_view_sampler(
            {"name": "sequential", "num_context_views": 8,
             "num_target_views": 12,
             "min_distance_between_context_views": 30,
             "max_distance_between_context_views": 90}, "train"
        )
        assert s.num_context_views == 8


class TestDataset:
    def test_iterates_examples(self, tmp_path):
        root = make_chunk(tmp_path)
        cfg = DatasetRE10kConfig(roots=(str(root),), input_image_shape=(64, 64))
        sampler = make_view_sampler(
            ViewSamplerSequentialConfig(
                num_context_views=4, num_target_views=3,
                min_distance_between_context_views=2,
                max_distance_between_context_views=4,
            ),
            "train",
        )
        ds = DatasetRE10k(cfg, "train", sampler, seed=0)
        ex = next(iter(ds))
        assert ex["context"]["image"].shape == (4, 64, 64, 3)
        assert ex["target"]["image"].shape == (3, 64, 64, 3)
        assert ex["context"]["extrinsics"].shape == (4, 4, 4)
        # relative pose: first context frame is identity
        np.testing.assert_allclose(
            ex["context"]["extrinsics"][0], np.eye(4), atol=1e-5
        )
        # baseline 1: |t_first - t_last| == 1
        d = np.linalg.norm(
            ex["context"]["extrinsics"][0, :3, 3]
            - ex["context"]["extrinsics"][-1, :3, 3]
        )
        np.testing.assert_allclose(d, 1.0, atol=1e-4)
        # intrinsics updated by crop: fx scaled by w_in/w_out after resize
        assert ex["context"]["intrinsics"][0, 0, 0] > 0.9

    def test_data_module_batching(self, tmp_path):
        root = make_chunk(tmp_path)
        dm = DataModule(
            dataset_cfgs={
                "re10k": {
                    "name": "re10k",
                    "roots": [str(root)],
                    "input_image_shape": [64, 64],
                    "view_sampler": {
                        "name": "sequential",
                        "num_context_views": 3,
                        "num_target_views": 2,
                        "min_distance_between_context_views": 2,
                        "max_distance_between_context_views": 4,
                    },
                }
            },
            data_loader_cfg={"train": {"batch_size": 2, "seed": 0}},
        )
        batch = next(iter(dm.train_dataloader()))
        assert batch["context"]["image"].shape == (2, 3, 64, 64, 3)
        assert batch["target"]["image"].shape == (2, 2, 64, 64, 3)
        assert batch["context"]["near"].shape == (2, 3)
        assert len(batch["scene"]) == 2


class TestShims:
    def test_reflect_involution(self):
        rng = np.random.default_rng(0)
        views = {
            "image": rng.uniform(size=(2, 8, 8, 3)).astype(np.float32),
            "extrinsics": np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
        }
        views["extrinsics"][:, :3, 3] = rng.normal(size=(2, 3))
        twice = reflect_views(reflect_views(views))
        np.testing.assert_allclose(twice["image"], views["image"])
        np.testing.assert_allclose(twice["extrinsics"], views["extrinsics"], atol=1e-6)

    def test_crop_shim_intrinsics(self):
        rng = np.random.default_rng(0)
        ex = {
            "context": {
                "image": rng.uniform(size=(1, 360, 640, 3)).astype(np.float32),
                "intrinsics": np.tile(np.eye(3, dtype=np.float32), (1, 1, 1)),
            },
            "target": {
                "image": rng.uniform(size=(1, 360, 640, 3)).astype(np.float32),
                "intrinsics": np.tile(np.eye(3, dtype=np.float32), (1, 1, 1)),
            },
        }
        out = apply_crop_shim(ex, (256, 256))
        assert out["context"]["image"].shape == (1, 256, 256, 3)
        # 640x360 -> scale to 455x256 -> crop x: fx *= 455/256
        np.testing.assert_allclose(
            out["context"]["intrinsics"][0, 0, 0], 455 / 256, rtol=1e-3
        )


class TestMultiWorker:
    def test_shards_cover_all_examples(self, tmp_path):
        """num_workers shards partition the chunk set: the union of examples
        equals the single-thread set (order aside)."""
        make_chunk(tmp_path, n_scenes=4, n_views=12, hw=(64, 64))
        cfgs = {
            "re10k": {
                "name": "re10k",
                "roots": [str(tmp_path)],
                "input_image_shape": [32, 32],
                "view_sampler": {
                    "name": "sequential",
                    "num_context_views": 2,
                    "num_target_views": 1,
                    "min_distance_between_context_views": 2,
                    "max_distance_between_context_views": 3,
                },
            }
        }
        loader_cfg = {"train": {"batch_size": 1, "seed": 7, "num_workers": 2}}
        dm = DataModule(cfgs, loader_cfg)
        scenes_mw = sorted(
            b["scene"][0] for b in dm.train_dataloader()
        )
        loader_cfg0 = {"train": {"batch_size": 1, "seed": 7, "num_workers": 0}}
        dm0 = DataModule(cfgs, loader_cfg0)
        scenes_st = sorted(b["scene"][0] for b in dm0.train_dataloader())
        assert scenes_mw == scenes_st and len(scenes_mw) == 4

    def test_multiworker_batching(self, tmp_path):
        make_chunk(tmp_path, n_scenes=6, n_views=12, hw=(64, 64))
        cfgs = {
            "re10k": {
                "name": "re10k",
                "roots": [str(tmp_path)],
                "input_image_shape": [32, 32],
                "view_sampler": {
                    "name": "sequential",
                    "num_context_views": 2,
                    "num_target_views": 1,
                    "min_distance_between_context_views": 2,
                    "max_distance_between_context_views": 3,
                },
            }
        }
        loader_cfg = {"train": {"batch_size": 2, "seed": 7, "num_workers": 3}}
        dm = DataModule(cfgs, loader_cfg)
        batches = list(dm.train_dataloader())
        assert len(batches) == 3  # 6 scenes, batch 2, drop_last
        for b in batches:
            assert b["context"]["image"].shape[0] == 2


class TestColmapLoader:
    """Round-trip a synthetic COLMAP text export (the exact format COLMAP's
    model_converter writes) through data/colmap.py."""

    def _write_model(self, d):
        import numpy as np

        # two cameras: PINHOLE + SIMPLE_PINHOLE
        (d / "cameras.txt").write_text(
            "# Camera list with one line of data per camera\n"
            "1 PINHOLE 640 480 500.0 510.0 320.0 240.0\n"
            "2 SIMPLE_PINHOLE 640 480 450.0 320.0 240.0\n"
        )
        # known pose: 90-degree rotation about z + translation
        qvec = np.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
        lines = [
            "# Image list with two lines of data per image",
            f"1 {qvec[0]} {qvec[1]} {qvec[2]} {qvec[3]} 1.0 2.0 3.0 1 b.jpg",
            "100.0 200.0 -1",
            "2 1 0 0 0 0 0 0 2 a.jpg",
            "",
        ]
        (d / "images.txt").write_text("\n".join(lines) + "\n")

    def test_load_scene(self, tmp_path):
        import numpy as np

        from vicasplat_tpu.data.colmap import load_colmap_scene

        self._write_model(tmp_path)
        ext, K, names = load_colmap_scene(tmp_path)
        assert names == ["a.jpg", "b.jpg"]  # sorted by name
        assert ext.shape == (2, 4, 4) and K.shape == (2, 3, 3)
        # a.jpg: identity pose, SIMPLE_PINHOLE fx=fy=450
        np.testing.assert_allclose(ext[0], np.eye(4), atol=1e-6)
        np.testing.assert_allclose(K[0][0, 0], 450.0 / 640, atol=1e-6)
        np.testing.assert_allclose(K[0][1, 1], 450.0 / 480, atol=1e-6)
        # b.jpg: c2w inverse of the 90-deg-z w2c with t=(1,2,3)
        Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
        w2c = np.eye(4)
        w2c[:3, :3] = Rz
        w2c[:3, 3] = [1.0, 2.0, 3.0]
        np.testing.assert_allclose(ext[1], np.linalg.inv(w2c), atol=1e-5)
        np.testing.assert_allclose(K[1][0, 2], 0.5, atol=1e-6)


class TestLoaderConfigSchema:
    def test_train_batch_size_typed(self):
        from vicasplat_tpu.data.data_module import DataModule

        dm = DataModule({"re10k": {}}, {"train": {"batch_size": 16}})
        assert dm.train_batch_size() == 16

    def test_typo_key_raises(self):
        # a mis-schema'd loader config must raise, not silently default to
        # batch_size=2 and quietly stop sharding the batch (VERDICT r2 #6)
        import pytest

        from vicasplat_tpu.data.data_module import DataModule

        dm = DataModule({"re10k": {}}, {"train": {"batchsize": 16}})
        with pytest.raises(ValueError, match="batchsize"):
            dm.train_batch_size()

    def test_per_dataset_override_allowed(self):
        from vicasplat_tpu.data.data_module import DataModule

        dm = DataModule(
            {"re10k": {}}, {"train": {"re10k": {"batch_size": 8}}}
        )
        assert dm.train_batch_size() == 8


class TestNativeJpegDecode:
    """C++ libjpeg batch decoder (data/native/) vs the PIL fallback."""

    @staticmethod
    def _jpegs(n=4, hw=(48, 64), quality=90):
        import io

        from PIL import Image

        rng = np.random.default_rng(0)
        bufs = []
        for _ in range(n):
            img = Image.fromarray(
                rng.integers(0, 255, (*hw, 3), dtype=np.uint8), "RGB")
            b = io.BytesIO()
            img.save(b, "JPEG", quality=quality)
            bufs.append(np.frombuffer(b.getvalue(), np.uint8))
        return bufs

    def test_matches_pil_exactly(self):
        import io

        import pytest
        from PIL import Image

        from vicasplat_tpu.data.native import decode_jpegs_u8_native, load

        if load() is None:
            pytest.skip("native decoder unavailable (no g++/libjpeg)")
        bufs = self._jpegs()
        out = decode_jpegs_u8_native(bufs)
        assert out is not None and out.shape == (4, 48, 64, 3)
        pil = np.stack([
            np.asarray(Image.open(io.BytesIO(b.tobytes())).convert("RGB"))
            for b in bufs
        ])
        # both paths are libjpeg underneath -> bit-identical
        np.testing.assert_array_equal(out, pil)

    def test_fallbacks_return_none(self):
        import pytest

        from vicasplat_tpu.data.native import decode_jpegs_u8_native, load

        if load() is None:
            pytest.skip("native decoder unavailable (no g++/libjpeg)")
        bufs = self._jpegs(2)
        mixed = bufs + self._jpegs(1, hw=(32, 32))
        assert decode_jpegs_u8_native(mixed) is None
        assert decode_jpegs_u8_native(
            [np.frombuffer(b"not a jpeg", np.uint8)]) is None

    def test_decode_jpegs_u8_uses_it(self):
        """The dataset decode entry point returns identical pixels whether
        or not the native path serves the batch."""
        from vicasplat_tpu.data.dataset_re10k import decode_jpegs_u8

        bufs = self._jpegs(3)
        out = decode_jpegs_u8(bufs)
        assert out.shape == (3, 48, 64, 3) and out.dtype == np.uint8


class TestReferenceFrozenIndex:
    """The published evaluation protocol is the reference's frozen
    assets/evaluation_index_*.json; our evaluation sampler must consume
    those files as-is (users bring them over unchanged)."""

    import pathlib as _pl

    INDEX = _pl.Path("/root/reference/assets/evaluation_index_re10k_8v.json")

    @pytest.mark.skipif(not INDEX.exists(),
                        reason="reference assets not present")
    def test_real_index_loads_and_samples(self):
        import json

        from vicasplat_tpu.data.view_samplers import (
            ViewSamplerEvaluation, ViewSamplerEvaluationConfig,
        )

        cfg = ViewSamplerEvaluationConfig(
            index_path=str(self.INDEX), num_context_views=8)
        sampler = ViewSamplerEvaluation(cfg, "test")
        raw = json.load(open(self.INDEX))
        rng = np.random.default_rng(0)
        n_checked = 0
        for scene, entry in raw.items():
            if entry is None:
                continue
            ctx, tgt, overlap = sampler.sample(scene, 8, rng)
            assert ctx.dtype == np.int64 and tgt.dtype == np.int64
            assert len(ctx) == len(entry["context"])
            assert list(ctx) == list(entry["context"])
            assert list(tgt) == list(entry["target"])
            assert 0.0 <= overlap <= 1.0
            n_checked += 1
            if n_checked >= 50:
                break
        assert n_checked == 50
