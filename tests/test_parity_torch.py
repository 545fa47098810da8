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


class TestTorchCheckpointFile:
    def test_load_torch_checkpoint_file(self, tmp_path):
        """Round-trip through an actual torch-serialized .ckpt file (the
        Lightning format the released weights use)."""
        from vicasplat_tpu.models import (
            GaussianAdapterConfig,
            VicaNetConfig,
            VicaSplatConfig,
            init_vicasplat,
        )
        from vicasplat_tpu.utils.ckpt_convert import (
            export_torch_state_dict,
            load_torch_checkpoint,
        )

        cfg = VicaSplatConfig(
            backbone=VicaNetConfig(
                img_size=32, patch_size=16, enc_embed_dim=64, enc_depth=2,
                enc_num_heads=4, dec_embed_dim=48, dec_depth=4, dec_num_heads=4,
            ),
            gaussian_adapter=GaussianAdapterConfig(sh_degree=1),
        )
        params = init_vicasplat(jax.random.PRNGKey(3), cfg)
        sd = {k: torch.from_numpy(np.asarray(v))
              for k, v in export_torch_state_dict(params).items()}
        path = tmp_path / "ckpt.ckpt"
        torch.save({"state_dict": sd, "epoch": 0}, path)

        params2 = load_torch_checkpoint(str(path))
        flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
        flat2 = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(params2)[0]
        }
        for p, v in flat1:
            np.testing.assert_allclose(
                v, flat2[jax.tree_util.keystr(p)], atol=1e-6,
                err_msg=jax.tree_util.keystr(p),
            )


class TestMast3rIngest:
    def test_mast3r_overlay(self):
        """MASt3R-style state dict overlays encoder/decoder/center-head
        weights onto a fresh VicaSplat init (weight_modify semantics)."""
        from vicasplat_tpu.models import (
            GaussianAdapterConfig,
            VicaNetConfig,
            VicaSplatConfig,
            init_vicasplat,
        )
        from vicasplat_tpu.models.dust3r import Dust3RConfig, init_dust3r
        from vicasplat_tpu.utils.ckpt_convert import (
            mast3r_to_vicasplat_params,
        )

        # teacher with conf head (4 channels), student without (3)
        d_cfg = Dust3RConfig(
            img_size=32, patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=4, dec_embed_dim=48, dec_depth=4, dec_num_heads=4,
            predict_conf=True,
        )
        teacher = init_dust3r(jax.random.PRNGKey(0), d_cfg)
        # build a MASt3R-like flat state dict from the teacher pytree
        from vicasplat_tpu.utils import ckpt_convert as cc

        sd = {}
        def put_lin(prefix, p):
            sd[prefix + ".weight"] = np.asarray(p["w"]).T
            if "b" in p:
                sd[prefix + ".bias"] = np.asarray(p["b"])
        def put_ln(prefix, p):
            sd[prefix + ".weight"] = np.asarray(p["scale"])
            sd[prefix + ".bias"] = np.asarray(p["bias"])
        def put_conv(prefix, p, t=False):
            sd[prefix + ".weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
            if "b" in p:
                sd[prefix + ".bias"] = np.asarray(p["b"])

        put_conv("patch_embed.proj", teacher["patch_embed"]["proj"])
        put_ln("enc_norm", teacher["enc_norm"])
        put_lin("decoder_embed", teacher["decoder_embed"])
        put_ln("dec_norm", teacher["dec_norm"])
        for i in range(2):
            blk = jax.tree.map(lambda x, i=i: np.asarray(x[i]), teacher["enc_blocks"])
            p = f"enc_blocks.{i}"
            put_ln(p + ".norm1", blk["norm1"]); put_ln(p + ".norm2", blk["norm2"])
            put_lin(p + ".attn.qkv", blk["attn"]["qkv"]); put_lin(p + ".attn.proj", blk["attn"]["proj"])
            put_lin(p + ".mlp.fc1", blk["mlp"]["fc1"]); put_lin(p + ".mlp.fc2", blk["mlp"]["fc2"])
        for i in range(4):
            blk = jax.tree.map(lambda x, i=i: np.asarray(x[i]), teacher["dec_blocks"])
            p = f"dec_blocks.{i}"
            for nm in ("norm1", "norm2", "norm3", "norm_y"):
                put_ln(p + "." + nm, blk[nm])
            put_lin(p + ".attn.qkv", blk["attn"]["qkv"]); put_lin(p + ".attn.proj", blk["attn"]["proj"])
            for nm in ("projq", "projk", "projv", "proj"):
                put_lin(p + ".cross_attn." + nm, blk["cross_attn"][nm])
            put_lin(p + ".mlp.fc1", blk["mlp"]["fc1"]); put_lin(p + ".mlp.fc2", blk["mlp"]["fc2"])
        # dpt head (teacher head1 has 4 output channels)
        h = teacher["head1"]
        put_conv("downstream_head1.dpt.act_postprocess.0.0", h["proj0"])
        sd["downstream_head1.dpt.act_postprocess.0.1.weight"] = np.asarray(h["up0"]["w"]).transpose(3, 2, 0, 1)
        sd["downstream_head1.dpt.act_postprocess.0.1.bias"] = np.asarray(h["up0"]["b"])
        put_conv("downstream_head1.dpt.act_postprocess.1.0", h["proj1"])
        sd["downstream_head1.dpt.act_postprocess.1.1.weight"] = np.asarray(h["up1"]["w"]).transpose(3, 2, 0, 1)
        sd["downstream_head1.dpt.act_postprocess.1.1.bias"] = np.asarray(h["up1"]["b"])
        put_conv("downstream_head1.dpt.act_postprocess.2.0", h["proj2"])
        put_conv("downstream_head1.dpt.act_postprocess.3.0", h["proj3"])
        put_conv("downstream_head1.dpt.act_postprocess.3.1", h["down3"])
        for i in range(4):
            put_conv(f"downstream_head1.dpt.scratch.layer{i+1}_rn", h[f"scratch{i}"])
        for i in range(1, 5):
            r = h[f"refinenet{i}"]
            rp = f"downstream_head1.dpt.scratch.refinenet{i}"
            put_conv(rp + ".resConfUnit1.conv1", r["rcu1"]["conv1"])
            put_conv(rp + ".resConfUnit1.conv2", r["rcu1"]["conv2"])
            put_conv(rp + ".resConfUnit2.conv1", r["rcu2"]["conv1"])
            put_conv(rp + ".resConfUnit2.conv2", r["rcu2"]["conv2"])
            put_conv(rp + ".out_conv", r["out_conv"])
        put_conv("downstream_head1.dpt.head.0", h["head"]["conv1"])
        put_conv("downstream_head1.dpt.head.2", h["head"]["conv2"])
        put_conv("downstream_head1.dpt.head.4", h["head"]["conv3"])

        v_cfg = VicaSplatConfig(
            backbone=VicaNetConfig(
                img_size=32, patch_size=16, enc_embed_dim=64, enc_depth=2,
                enc_num_heads=4, dec_embed_dim=48, dec_depth=4, dec_num_heads=4,
            ),
            gaussian_adapter=GaussianAdapterConfig(sh_degree=1),
            predict_conf=False,
        )
        student = init_vicasplat(jax.random.PRNGKey(1), v_cfg)
        merged = mast3r_to_vicasplat_params(sd, student)
        # encoder block weights transferred
        np.testing.assert_allclose(
            merged["backbone"]["enc_blocks"]["attn"]["qkv"]["w"][0],
            np.asarray(teacher["enc_blocks"]["attn"]["qkv"]["w"][0]),
            atol=1e-6,
        )
        # conf channel sliced off the center head (4 -> 3)
        assert merged["center_head"]["head"]["conv3"]["b"].shape == (3,)
        # vica-only params keep their fresh init
        np.testing.assert_allclose(
            merged["backbone"]["camera_extrinsic_token"],
            student["backbone"]["camera_extrinsic_token"],
            atol=1e-6,
        )


class TestLowChannelConvForms:
    """The im2col / patchify matmul forms must equal the lax conv exactly
    (they exist to dodge the MXU's low-input-channel padding waste)."""

    def test_im2col_matches_conv(self):
        rng = np.random.default_rng(11)
        p = {
            "w": jnp.asarray(rng.normal(size=(7, 7, 3, 32)).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(32,)).astype(np.float32)),
        }
        x = jnp.asarray(rng.normal(size=(2, 24, 24, 3)).astype(np.float32))
        a = layers.conv2d(p, x, stride=1, padding=((3, 3), (3, 3)))
        b = layers.conv2d_im2col(p, x, 7)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_s2d_matches_conv(self):
        rng = np.random.default_rng(13)
        for k, s2, cin in [(7, 4, 3), (3, 2, 5), (5, 4, 3)]:
            p = {
                "w": jnp.asarray(rng.normal(size=(k, k, cin, 16)).astype(np.float32)),
                "b": jnp.asarray(rng.normal(size=(16,)).astype(np.float32)),
            }
            x = jnp.asarray(rng.normal(size=(2, 16, 32, cin)).astype(np.float32))
            a = layers.conv2d(p, x, stride=1, padding="SAME")
            b = layers.conv2d_s2d(p, x, k, s=s2)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_patchify_matches_conv(self):
        rng = np.random.default_rng(12)
        p = {
            "w": jnp.asarray(rng.normal(size=(16, 16, 3, 64)).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(64,)).astype(np.float32)),
        }
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        a = layers.conv2d(p, x, stride=16, padding="VALID")
        b = layers.conv2d_patchify(p, x, 16)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestResamplePatchEmbed:
    """FlexiViT patch-embed resampling (reference weight_modify.py:13-112):
    patchify-conv with the resampled kernel on a resized image approximates
    the original patchify-conv."""

    def test_identity_at_same_size(self):
        from vicasplat_tpu.utils.ckpt_convert import resample_patch_embed

        k = np.random.default_rng(0).normal(size=(16, 16, 3, 8)).astype(np.float32)
        np.testing.assert_array_equal(resample_patch_embed(k, (16, 16)), k)

    def test_flexivit_property(self):
        import torch
        import torch.nn.functional as F

        from vicasplat_tpu.utils.ckpt_convert import resample_patch_embed

        rng = np.random.default_rng(1)
        k8 = rng.normal(size=(8, 8, 3, 4)).astype(np.float32)
        k16 = resample_patch_embed(k8, (16, 16))
        img = rng.normal(size=(1, 3, 24, 24)).astype(np.float32)  # 3x3 patches
        big = F.interpolate(torch.from_numpy(img), size=(48, 48),
                            mode="bicubic", antialias=True).numpy()

        def patchify(x, k):
            p = k.shape[0]
            t = torch.conv2d(torch.from_numpy(x),
                             torch.from_numpy(k.transpose(3, 2, 0, 1)),
                             stride=p)
            return t.numpy()

        a = patchify(img, k8)
        b = patchify(big, k16)
        # bicubic resize is approximately inverted; tokens should correlate
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.98, corr
