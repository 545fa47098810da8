"""Numerical-parity tests of our TPU primitives against torch (CPU) ops.

These pin the layout/semantics conversions the checkpoint converter relies
on: Linear transposes, Conv2d OIHW->HWIO with torch padding, ConvTranspose2d
IOHW->HWIO, align_corners bilinear resize, exact GELU, LayerNorm eps, and the
full checkpoint export->import round trip.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from vicasplat_tpu.models import layers  # noqa: E402


def to_t(x):
    return torch.from_numpy(np.asarray(x))


class TestOpParity:
    def test_linear(self):
        rng = np.random.default_rng(0)
        w_t = rng.normal(size=(24, 16)).astype(np.float32)  # torch (out, in)
        b = rng.normal(size=(24,)).astype(np.float32)
        x = rng.normal(size=(5, 16)).astype(np.float32)
        ours = layers.linear({"w": jnp.asarray(w_t.T), "b": jnp.asarray(b)}, jnp.asarray(x))
        theirs = F.linear(to_t(x), to_t(w_t), to_t(b)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    @pytest.mark.parametrize("k,stride,pad", [(3, 1, 1), (7, 1, 3), (1, 1, 0), (16, 16, 0)])
    def test_conv2d(self, k, stride, pad):
        rng = np.random.default_rng(1)
        w_t = rng.normal(size=(8, 6, k, k)).astype(np.float32)  # OIHW
        b = rng.normal(size=(8,)).astype(np.float32)
        x = rng.normal(size=(2, 6, 32, 32)).astype(np.float32)  # NCHW
        ours = layers.conv2d(
            {"w": jnp.asarray(w_t.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            stride=stride,
            padding="VALID" if pad == 0 else ((pad, pad), (pad, pad)),
        )
        theirs = F.conv2d(to_t(x), to_t(w_t), to_t(b), stride=stride, padding=pad)
        np.testing.assert_allclose(
            ours, theirs.numpy().transpose(0, 2, 3, 1), atol=1e-4
        )

    def test_conv2d_stride2_pad1(self):
        """The DPT down3 conv: 3x3 stride 2 pad 1 on even input."""
        rng = np.random.default_rng(2)
        w_t = rng.normal(size=(4, 4, 3, 3)).astype(np.float32)
        x = rng.normal(size=(1, 4, 16, 16)).astype(np.float32)
        ours = layers.conv2d(
            {"w": jnp.asarray(w_t.transpose(2, 3, 1, 0))},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            stride=2, padding=((1, 1), (1, 1)),
        )
        theirs = F.conv2d(to_t(x), to_t(w_t), stride=2, padding=1)
        np.testing.assert_allclose(
            ours, theirs.numpy().transpose(0, 2, 3, 1), atol=1e-4
        )

    @pytest.mark.parametrize("k", [2, 4])
    def test_conv_transpose(self, k):
        """DPT up-projections: kernel == stride, no padding."""
        rng = np.random.default_rng(3)
        w_t = rng.normal(size=(6, 8, k, k)).astype(np.float32)  # torch IOHW
        b = rng.normal(size=(8,)).astype(np.float32)
        x = rng.normal(size=(2, 6, 8, 8)).astype(np.float32)
        ours = layers.conv_transpose2d(
            # converter layout: (kh, kw, OUT, IN)
            {"w": jnp.asarray(w_t.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            stride=k,
        )
        theirs = F.conv_transpose2d(to_t(x), to_t(w_t), to_t(b), stride=k)
        np.testing.assert_allclose(
            ours, theirs.numpy().transpose(0, 2, 3, 1), atol=1e-4
        )

    @pytest.mark.parametrize("scale", [2])
    def test_bilinear_align_corners(self, scale):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
        ours = layers.resize_bilinear_align_corners(
            jnp.asarray(x.transpose(0, 2, 3, 1)), (16 * scale, 16 * scale)
        )
        theirs = F.interpolate(
            to_t(x), scale_factor=scale, mode="bilinear", align_corners=True
        )
        np.testing.assert_allclose(
            ours, theirs.numpy().transpose(0, 2, 3, 1), atol=1e-5
        )

    def test_gelu_exact(self):
        x = np.linspace(-4, 4, 101).astype(np.float32)
        ours = jax.nn.gelu(jnp.asarray(x), approximate=False)
        theirs = F.gelu(to_t(x)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_layernorm(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(4, 10, 32)).astype(np.float32)
        g = rng.normal(size=(32,)).astype(np.float32)
        b = rng.normal(size=(32,)).astype(np.float32)
        ours = layers.layernorm(
            {"scale": jnp.asarray(g), "bias": jnp.asarray(b)}, jnp.asarray(x)
        )
        theirs = F.layer_norm(to_t(x), (32,), to_t(g), to_t(b), eps=1e-6).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_silu(self):
        x = np.linspace(-4, 4, 101).astype(np.float32)
        np.testing.assert_allclose(
            jax.nn.silu(jnp.asarray(x)), F.silu(to_t(x)).numpy(), atol=1e-6
        )

    def test_sdpa(self):
        rng = np.random.default_rng(6)
        q = rng.normal(size=(2, 4, 10, 16)).astype(np.float32)  # B,H,S,D
        k = rng.normal(size=(2, 4, 12, 16)).astype(np.float32)
        v = rng.normal(size=(2, 4, 12, 16)).astype(np.float32)
        mask = rng.uniform(size=(10, 12)) > 0.3
        ours = layers.sdpa(
            jnp.asarray(q.transpose(0, 2, 1, 3)),
            jnp.asarray(k.transpose(0, 2, 1, 3)),
            jnp.asarray(v.transpose(0, 2, 1, 3)),
            mask=jnp.asarray(mask)[None, None],
        )
        theirs = F.scaled_dot_product_attention(
            to_t(q), to_t(k), to_t(v), attn_mask=to_t(mask)
        ).numpy()
        np.testing.assert_allclose(
            ours, theirs.transpose(0, 2, 1, 3), atol=1e-5
        )


class TestCheckpointRoundTrip:
    def test_export_import_identity(self):
        from vicasplat_tpu.models import (
            GaussianAdapterConfig,
            VicaNetConfig,
            VicaSplatConfig,
            init_vicasplat,
        )
        from vicasplat_tpu.utils.ckpt_convert import (
            convert_state_dict,
            export_torch_state_dict,
        )

        cfg = VicaSplatConfig(
            backbone=VicaNetConfig(
                img_size=32, patch_size=16, enc_embed_dim=64, enc_depth=2,
                enc_num_heads=4, dec_embed_dim=48, dec_depth=4, dec_num_heads=4,
            ),
            gaussian_adapter=GaussianAdapterConfig(sh_degree=1),
        )
        params = init_vicasplat(jax.random.PRNGKey(0), cfg)
        sd = export_torch_state_dict(params)
        # all values must be numpy, torch-layout (export carries the
        # Lightning-style 'encoder.' prefix, like the released checkpoints)
        assert sd["encoder.backbone.enc_blocks.0.attn.qkv.weight"].shape == (192, 64)
        params2 = convert_state_dict(sd)

        flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
        flat2_map = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(params2)[0]
        }
        assert len(flat1) == len(flat2_map)
        for path, v in flat1:
            key = jax.tree_util.keystr(path)
            np.testing.assert_allclose(
                v, flat2_map[key], atol=1e-6, err_msg=key
            )
