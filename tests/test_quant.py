"""Int8 W8A8 serving path: op-level error bounds, tree surgery, and the
quantized engine end-to-end (ops/quant.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from tests.test_model import tiny_cfg
from vicasplat_tpu.models.layers import linear, linear_init
from vicasplat_tpu.ops.quant import (
    cast_tree_preserving_quant, linear_w8a8, quantize_linear, quantize_tree,
)
from vicasplat_tpu.serving import InferenceEngine


class TestQuantOps:
    def test_linear_w8a8_matches_f32_closely(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        p = linear_init(k1, 256, 512)
        p["b"] = jax.random.normal(k2, (512,)) * 0.1
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 33, 256))
        ref = linear(p, x)
        out = linear_w8a8(quantize_linear(p), x)
        # symmetric per-channel int8: ~0.5-1% relative error on gaussians
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, rel

    def test_linear_dispatches_on_quantized_params(self):
        p = linear_init(jax.random.PRNGKey(0), 64, 64)
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 64))
        pq = quantize_linear(p)
        np.testing.assert_array_equal(
            np.asarray(linear(pq, x)), np.asarray(linear_w8a8(pq, x)))

    def test_quantize_tree_thresholds_and_structure(self):
        tree = {
            "big": linear_init(jax.random.PRNGKey(0), 128, 256),   # 32768
            "small": linear_init(jax.random.PRNGKey(1), 8, 8),     # 64
            "conv": {"w": jnp.ones((3, 3, 8, 8))},                 # 4-D: skip
            "nested": {"inner": linear_init(jax.random.PRNGKey(2), 256, 128)},
        }
        out, n = quantize_tree(tree, min_size=1 << 14)
        assert n == 2
        assert out["big"]["w_q"].dtype == jnp.int8
        assert out["small"]["w"].dtype == jnp.float32
        assert out["conv"]["w"].shape == (3, 3, 8, 8)
        assert out["nested"]["inner"]["w_s"].shape == (128,)

    def test_stacked_block_kernels_quantize(self):
        """3-D (L, d_in, d_out) stacked-block kernels — the model's dominant
        matmuls, sliced per layer by lax.scan — must quantize, and each
        sliced layer must equal quantizing that layer alone."""
        w = jax.random.normal(jax.random.PRNGKey(0), (4, 128, 256))
        b = jax.random.normal(jax.random.PRNGKey(1), (4, 256))
        out, n = quantize_tree({"blocks": {"w": w, "b": b}}, min_size=1 << 14)
        assert n == 1
        assert out["blocks"]["w_q"].shape == (4, 128, 256)
        assert out["blocks"]["w_s"].shape == (4, 256)
        layer2 = jax.tree.map(lambda x: x[2], out["blocks"])
        alone = quantize_linear({"w": w[2], "b": b[2]})
        np.testing.assert_array_equal(np.asarray(layer2["w_q"]),
                                      np.asarray(alone["w_q"]))
        np.testing.assert_allclose(np.asarray(layer2["w_s"]),
                                   np.asarray(alone["w_s"]))
        # 4-D conv kernels stay untouched (consumed via p["w"] directly)
        out2, n2 = quantize_tree({"conv": {"w": jnp.ones((7, 7, 64, 64))}},
                                 min_size=1)
        assert n2 == 0 and "w" in out2["conv"]

    def test_cast_preserves_quant_dtypes(self):
        tree, _ = quantize_tree(
            {"l": linear_init(jax.random.PRNGKey(0), 128, 256)}, min_size=1)
        cast = cast_tree_preserving_quant(tree, jnp.bfloat16)
        assert cast["l"]["w_q"].dtype == jnp.int8
        assert cast["l"]["w_s"].dtype == jnp.float32
        assert cast["l"]["b"].dtype == jnp.bfloat16


class TestQuantizedEngine:
    def test_reconstruct_close_to_f32(self):
        cfg = tiny_cfg()
        images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32, 3))
        K = jnp.broadcast_to(
            jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
            (1, 3, 3, 3))
        ref_eng = InferenceEngine(cfg, dtype=jnp.float32)
        q_eng = InferenceEngine(cfg, params=jax.device_get(ref_eng.params),
                                dtype=jnp.float32, quantize=True, quantize_min_size=1)
        assert q_eng.n_quantized > 0
        ref = ref_eng.reconstruct(images, K)
        out = q_eng.reconstruct(images, K)
        assert np.isfinite(np.asarray(out.gaussians.means)).all()
        # quantization error through a deep net: loose but meaningful bound
        m_ref = np.asarray(ref.gaussians.means).ravel()
        m_q = np.asarray(out.gaussians.means).ravel()
        corr = np.corrcoef(m_ref, m_q)[0, 1]
        assert corr > 0.95, corr

    def test_sensitive_families_stay_float_by_default(self):
        """The engine's default excludes quant.SENSITIVE_PATHS (the
        expm1-amplified center head: -2.0 dB alone vs -0.16 dB for all
        other families together, job 043 sensitivity study)."""
        def paths_with_int8(node, path=""):
            if isinstance(node, dict):
                if "w_q" in node:
                    return [path]
                return [p for k, v in node.items()
                        for p in paths_with_int8(v, f"{path}/{k}")]
            return []

        import dataclasses

        # linear heads: the trained-ckpt config where /center_head/proj is
        # a quantizable linear (DPT heads are 4-D convs, never quantized)
        cfg = dataclasses.replace(tiny_cfg(), gs_center_head_type="linear",
                                  gs_param_head_type="linear")
        eng = InferenceEngine(cfg, quantize=True, quantize_min_size=1)
        qpaths = paths_with_int8(eng.params)
        assert qpaths, "nothing quantized"
        assert not any("/center_head/" in p for p in qpaths), qpaths
        # explicit empty exclude restores the full sweep
        eng_all = InferenceEngine(cfg, quantize=True, quantize_min_size=1,
                                  quantize_exclude=())
        all_paths = paths_with_int8(eng_all.params)
        assert any("/center_head/" in p for p in all_paths)
        assert eng_all.n_quantized > eng.n_quantized
