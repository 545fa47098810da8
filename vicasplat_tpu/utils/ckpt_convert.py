"""Torch checkpoint -> vicasplat_tpu pytree conversion.

Ingests the reference's released Lightning checkpoints ({'state_dict': {...}}
with 'encoder.'-prefixed keys, reference src/main.py:141-154) and produces
the parameter pytree of models/vicasplat.init_vicasplat.

Layout conversions:
  - torch Linear (out, in)        -> (in, out)
  - torch Conv2d OIHW             -> HWIO
  - torch ConvTranspose2d IOHW    -> HWIO (see conv_transpose parity test)
  - per-block keys enc_blocks.{i} -> stacked leading axis for lax.scan

The loader works from a {key: np.ndarray} dict so torch is only needed by the
caller (torch.load -> .numpy()).
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np
import jax.numpy as jnp


def _lin(sd, prefix):
    p = {"w": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    if prefix + ".bias" in sd:
        p["b"] = sd[prefix + ".bias"]
    return p


def _ln(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _conv(sd, prefix):
    # OIHW -> HWIO
    p = {"w": np.ascontiguousarray(sd[prefix + ".weight"].transpose(2, 3, 1, 0))}
    if prefix + ".bias" in sd:
        p["b"] = sd[prefix + ".bias"]
    return p


def _conv_t(sd, prefix):
    # torch ConvTranspose2d weight is IOHW -> (kh, kw, OUT, IN)
    # (layers.conv_transpose2d uses transpose_kernel=True)
    p = {"w": np.ascontiguousarray(sd[prefix + ".weight"].transpose(2, 3, 1, 0))}
    if prefix + ".bias" in sd:
        p["b"] = sd[prefix + ".bias"]
    return p


def _mlp(sd, prefix):
    return {"fc1": _lin(sd, prefix + ".fc1"), "fc2": _lin(sd, prefix + ".fc2")}


def _stack(blocks):
    import jax

    return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *blocks)


def _enc_block(sd, p):
    return {
        "norm1": _ln(sd, p + ".norm1"),
        "attn": {"qkv": _lin(sd, p + ".attn.qkv"), "proj": _lin(sd, p + ".attn.proj")},
        "norm2": _ln(sd, p + ".norm2"),
        "mlp": _mlp(sd, p + ".mlp"),
    }


def _dec_block(sd, p):
    out = {
        "cam_norm1": _ln(sd, p + ".cam_norm1"),
        "norm1": _ln(sd, p + ".norm1"),
        "attn": {"qkv": _lin(sd, p + ".attn.qkv"), "proj": _lin(sd, p + ".attn.proj")},
        "cam_norm2": _ln(sd, p + ".cam_norm2"),
        "norm3": _ln(sd, p + ".norm3"),
        "mlp": _mlp(sd, p + ".mlp"),
        "mlp_cam": _mlp(sd, p + ".mlp_cam"),
    }
    if p + ".modulation1.proj.weight" in sd:
        out["modulation1"] = {"proj": _lin(sd, p + ".modulation1.proj")}
        out["modulation2"] = {"proj": _lin(sd, p + ".modulation2.proj")}
    if p + ".cross_attn.projq.weight" in sd:
        out["norm2"] = _ln(sd, p + ".norm2")
        out["cross_attn"] = {
            "projq": _lin(sd, p + ".cross_attn.projq"),
            "projk": _lin(sd, p + ".cross_attn.projk"),
            "projv": _lin(sd, p + ".cross_attn.projv"),
            "proj": _lin(sd, p + ".cross_attn.proj"),
        }
    return out


def _dpt(sd, p, head_type):
    """p points at '...<head>.dpt'."""
    out = {
        "proj0": _conv(sd, p + ".act_postprocess.0.0"),
        "up0": _conv_t(sd, p + ".act_postprocess.0.1"),
        "proj1": _conv(sd, p + ".act_postprocess.1.0"),
        "up1": _conv_t(sd, p + ".act_postprocess.1.1"),
        "proj2": _conv(sd, p + ".act_postprocess.2.0"),
        "proj3": _conv(sd, p + ".act_postprocess.3.0"),
        "down3": _conv(sd, p + ".act_postprocess.3.1"),
    }
    for i in range(4):
        out[f"scratch{i}"] = _conv(sd, p + f".scratch.layer{i + 1}_rn")
    for i in range(1, 5):
        rp = p + f".scratch.refinenet{i}"
        out[f"refinenet{i}"] = {
            "rcu1": {
                "conv1": _conv(sd, rp + ".resConfUnit1.conv1"),
                "conv2": _conv(sd, rp + ".resConfUnit1.conv2"),
            },
            "rcu2": {
                "conv1": _conv(sd, rp + ".resConfUnit2.conv1"),
                "conv2": _conv(sd, rp + ".resConfUnit2.conv2"),
            },
            "out_conv": _conv(sd, rp + ".out_conv"),
        }
    if head_type == "regression":
        out["head"] = {
            "conv1": _conv(sd, p + ".head.0"),
            "conv2": _conv(sd, p + ".head.2"),
            "conv3": _conv(sd, p + ".head.4"),
        }
    else:  # gs_params: Sequential[conv, bn/Identity, ReLU, Dropout, conv]
        out["head"] = {
            "conv1": _conv(sd, p + ".head.0"),
            "conv2": _conv(sd, p + ".head.4"),
        }
    if p + ".input_merger.0.weight" in sd:
        out["input_merger"] = {"conv": _conv(sd, p + ".input_merger.0")}
    return out


def resample_patch_embed(kernel: np.ndarray, new_hw: tuple) -> np.ndarray:
    """FlexiViT patch-embed kernel resampling (reference
    src/misc/weight_modify.py:13-112, used by checkpoint_filter_fn when the
    checkpoint's patch size differs from the model's).

    kernel: (kh, kw, C, O) HWIO. Builds the resize operator B column by
    column (resize of each basis patch) and applies pinv(B)^T so that a
    conv with the resampled kernel on a resized image approximates the
    original conv — the exact pseudo-inverse construction of FlexiViT.
    """
    kh, kw, c, o = kernel.shape
    nh, nw = new_hw
    if (kh, kw) == (nh, nw):
        return kernel

    try:
        import torch
        import torch.nn.functional as F

        def resize(x):  # (kh, kw) -> (nh, nw), bicubic+antialias like torch
            t = torch.from_numpy(np.asarray(x, np.float32))[None, None]
            return F.interpolate(
                t, size=(nh, nw), mode="bicubic", antialias=True
            )[0, 0].numpy()
    except ImportError:  # pragma: no cover - torch is present in this env
        import jax
        import jax.numpy as jnp

        def resize(x):
            return np.asarray(jax.image.resize(
                jnp.asarray(x, jnp.float32), (nh, nw), method="cubic"))

    basis = np.eye(kh * kw, dtype=np.float32)
    B = np.stack(
        [resize(b.reshape(kh, kw)).reshape(-1) for b in basis], axis=1
    )  # (nh*nw, kh*kw)
    P = np.linalg.pinv(B.T)  # (nh*nw, kh*kw)
    flat = kernel.reshape(kh * kw, c * o)
    return (P @ flat).reshape(nh, nw, c, o).astype(kernel.dtype)


def convert_state_dict(sd: Dict[str, np.ndarray], patch_size: int = None) -> dict:
    """Reference VicaSplat state_dict (already 'encoder.'-stripped or not)
    -> params pytree. Keys follow reference module names
    (src/model/encoder/vicasplat.py + backbone_vica.py). When `patch_size`
    is given and differs from the checkpoint's, the patch-embed kernel is
    FlexiViT-resampled (reference weight_modify.checkpoint_filter_fn)."""
    # strip Lightning's 'encoder.' prefix if present
    if any(k.startswith("encoder.") for k in sd):
        sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}

    n_enc = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"backbone\.enc_blocks\.(\d+)\.", k))
    )
    n_dec = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"backbone\.dec_blocks\.(\d+)\.", k))
    )

    pe = _conv(sd, "backbone.patch_embed.proj")
    if patch_size is not None:
        pe["w"] = resample_patch_embed(pe["w"], (patch_size, patch_size))

    params = {
        "backbone": {
            "patch_embed": {"proj": pe},
            "enc_blocks": _stack(
                [_enc_block(sd, f"backbone.enc_blocks.{i}") for i in range(n_enc)]
            ),
            "enc_norm": _ln(sd, "backbone.enc_norm"),
            "decoder_embed": _lin(sd, "backbone.decoder_embed"),
            "camera_extrinsic_token": sd["backbone.camera_extrinsic_token"],
            "camera_intrinsic_token": sd["backbone.camera_intrinsic_token"],
            "dec_blocks": _stack(
                [_dec_block(sd, f"backbone.dec_blocks.{i}") for i in range(n_dec)]
            ),
            "dec_norm": _ln(sd, "backbone.dec_norm"),
            "camera_dec_norm": _ln(sd, "backbone.camera_dec_norm"),
        },
        "center_head": _dpt(sd, "downstream_head1.dpt", "regression"),
        "gaussian_param_head": _dpt(sd, "gaussian_param_head.dpt", "gs_params"),
        "camera_extrinsic_head": {"proj": _lin(sd, "camera_extrinsic_head.1")},
    }
    if "backbone.intrinsic_encoder.weight" in sd:
        params["backbone"]["intrinsic_encoder"] = _lin(sd, "backbone.intrinsic_encoder")
    if "camera_intrinsic_head.1.weight" in sd:
        params["camera_intrinsic_head"] = {"proj": _lin(sd, "camera_intrinsic_head.1")}

    import jax

    return jax.tree.map(jnp.asarray, params)


def load_torch_checkpoint(path: str) -> dict:
    """torch.load a checkpoint file -> params pytree.

    Dispatches on format: Lightning {'state_dict'} / raw VicaSplat keys ->
    convert_state_dict; MASt3R/DUSt3R-style {'model'} with two-view decoder
    keys -> convert_dust3r_state_dict (the teacher), matching the reference's
    three-format ingestion (src/main.py:141-154).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    elif "model" in ckpt:
        sd = ckpt["model"]
    else:
        sd = ckpt
    sd = {k: v.detach().cpu().float().numpy() for k, v in sd.items()
          if hasattr(v, "detach")}
    is_dust3r = any(
        k.startswith(("dec_blocks.", "downstream_head2.")) for k in sd
    ) and not any(k.startswith(("backbone.", "encoder.")) for k in sd)
    if is_dust3r:
        return convert_dust3r_state_dict(sd)
    return convert_state_dict(sd)


def export_torch_state_dict(params: dict) -> Dict[str, np.ndarray]:
    """Inverse conversion: params pytree -> reference-layout state_dict
    (for checkpoint interchange back to the torch ecosystem)."""
    sd: Dict[str, np.ndarray] = {}

    def put_lin(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["w"]).T
        if "b" in p:
            sd[prefix + ".bias"] = np.asarray(p["b"])

    def put_ln(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["scale"])
        sd[prefix + ".bias"] = np.asarray(p["bias"])

    def put_conv(prefix, p, transpose=False):
        # conv: HWIO (kh,kw,I,O) -> OIHW; conv_transpose: (kh,kw,O,I) -> IOHW.
        # Both are the same axis permutation (3,2,0,1).
        del transpose
        w = np.asarray(p["w"])
        sd[prefix + ".weight"] = np.ascontiguousarray(w.transpose(3, 2, 0, 1))
        if "b" in p:
            sd[prefix + ".bias"] = np.asarray(p["b"])

    bb = params["backbone"]
    put_conv("encoder.backbone.patch_embed.proj", bb["patch_embed"]["proj"])
    if "intrinsic_encoder" in bb:
        put_lin("encoder.backbone.intrinsic_encoder", bb["intrinsic_encoder"])
    put_ln("encoder.backbone.enc_norm", bb["enc_norm"])
    put_lin("encoder.backbone.decoder_embed", bb["decoder_embed"])
    sd["encoder.backbone.camera_extrinsic_token"] = np.asarray(
        bb["camera_extrinsic_token"]
    )
    sd["encoder.backbone.camera_intrinsic_token"] = np.asarray(
        bb["camera_intrinsic_token"]
    )
    put_ln("encoder.backbone.dec_norm", bb["dec_norm"])
    put_ln("encoder.backbone.camera_dec_norm", bb["camera_dec_norm"])

    import jax

    def unstack(tree, i):
        return jax.tree.map(lambda x: np.asarray(x[i]), tree)

    n_enc = bb["enc_blocks"]["norm1"]["scale"].shape[0]
    for i in range(n_enc):
        blk = unstack(bb["enc_blocks"], i)
        p = f"encoder.backbone.enc_blocks.{i}"
        put_ln(p + ".norm1", blk["norm1"])
        put_lin(p + ".attn.qkv", blk["attn"]["qkv"])
        put_lin(p + ".attn.proj", blk["attn"]["proj"])
        put_ln(p + ".norm2", blk["norm2"])
        put_lin(p + ".mlp.fc1", blk["mlp"]["fc1"])
        put_lin(p + ".mlp.fc2", blk["mlp"]["fc2"])

    n_dec = bb["dec_blocks"]["norm1"]["scale"].shape[0]
    for i in range(n_dec):
        blk = unstack(bb["dec_blocks"], i)
        p = f"encoder.backbone.dec_blocks.{i}"
        put_ln(p + ".cam_norm1", blk["cam_norm1"])
        put_ln(p + ".norm1", blk["norm1"])
        put_lin(p + ".attn.qkv", blk["attn"]["qkv"])
        put_lin(p + ".attn.proj", blk["attn"]["proj"])
        put_ln(p + ".cam_norm2", blk["cam_norm2"])
        put_ln(p + ".norm3", blk["norm3"])
        put_lin(p + ".mlp.fc1", blk["mlp"]["fc1"])
        put_lin(p + ".mlp.fc2", blk["mlp"]["fc2"])
        put_lin(p + ".mlp_cam.fc1", blk["mlp_cam"]["fc1"])
        put_lin(p + ".mlp_cam.fc2", blk["mlp_cam"]["fc2"])
        if "modulation1" in blk:
            put_lin(p + ".modulation1.proj", blk["modulation1"]["proj"])
            put_lin(p + ".modulation2.proj", blk["modulation2"]["proj"])
        if "cross_attn" in blk:
            put_ln(p + ".norm2", blk["norm2"])
            for name in ("projq", "projk", "projv", "proj"):
                put_lin(p + f".cross_attn.{name}", blk["cross_attn"][name])

    def put_dpt(prefix, dpt, head_type):
        put_conv(prefix + ".act_postprocess.0.0", dpt["proj0"])
        put_conv(prefix + ".act_postprocess.0.1", dpt["up0"], transpose=True)
        put_conv(prefix + ".act_postprocess.1.0", dpt["proj1"])
        put_conv(prefix + ".act_postprocess.1.1", dpt["up1"], transpose=True)
        put_conv(prefix + ".act_postprocess.2.0", dpt["proj2"])
        put_conv(prefix + ".act_postprocess.3.0", dpt["proj3"])
        put_conv(prefix + ".act_postprocess.3.1", dpt["down3"])
        for i in range(4):
            put_conv(prefix + f".scratch.layer{i + 1}_rn", dpt[f"scratch{i}"])
            # the reference registers the same conv twice (_make_scratch puts
            # layer{i}_rn modules in a ModuleList `layer_rn` as well,
            # reference dpt_block.py:33,70-71), so released checkpoints carry
            # both key spellings; emit the alias for exact format fidelity
            put_conv(prefix + f".scratch.layer_rn.{i}", dpt[f"scratch{i}"])
        for i in range(1, 5):
            r = dpt[f"refinenet{i}"]
            rp = prefix + f".scratch.refinenet{i}"
            put_conv(rp + ".resConfUnit1.conv1", r["rcu1"]["conv1"])
            put_conv(rp + ".resConfUnit1.conv2", r["rcu1"]["conv2"])
            put_conv(rp + ".resConfUnit2.conv1", r["rcu2"]["conv1"])
            put_conv(rp + ".resConfUnit2.conv2", r["rcu2"]["conv2"])
            put_conv(rp + ".out_conv", r["out_conv"])
        if head_type == "regression":
            put_conv(prefix + ".head.0", dpt["head"]["conv1"])
            put_conv(prefix + ".head.2", dpt["head"]["conv2"])
            put_conv(prefix + ".head.4", dpt["head"]["conv3"])
        else:
            put_conv(prefix + ".head.0", dpt["head"]["conv1"])
            put_conv(prefix + ".head.4", dpt["head"]["conv2"])
        if "input_merger" in dpt:
            put_conv(prefix + ".input_merger.0", dpt["input_merger"]["conv"])

    put_dpt("encoder.downstream_head1.dpt", params["center_head"], "regression")
    put_dpt("encoder.gaussian_param_head.dpt", params["gaussian_param_head"], "gs_params")
    put_lin("encoder.camera_extrinsic_head.1", params["camera_extrinsic_head"]["proj"])
    if "camera_intrinsic_head" in params:
        put_lin(
            "encoder.camera_intrinsic_head.1",
            params["camera_intrinsic_head"]["proj"],
        )
    return sd


# ---------------------------------------------------------------------------
# DUSt3R/MASt3R checkpoints
# ---------------------------------------------------------------------------

def convert_dust3r_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """MASt3R/DUSt3R-style checkpoint ({'model': sd}) -> models/dust3r pytree.

    (key layout: reference src/model/distiller/dust3d_backbone.py; a missing
    dec_blocks2 is duplicated from dec_blocks, :56-62)
    """
    if not any(k.startswith("dec_blocks2") for k in sd):
        sd = dict(sd)
        for k, v in list(sd.items()):
            if k.startswith("dec_blocks."):
                sd[k.replace("dec_blocks.", "dec_blocks2.", 1)] = v

    n_enc = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"enc_blocks\.(\d+)\.", k))
    )
    n_dec = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"dec_blocks\.(\d+)\.", k))
    )

    def cross_block(p):
        return {
            "norm1": _ln(sd, p + ".norm1"),
            "attn": {"qkv": _lin(sd, p + ".attn.qkv"), "proj": _lin(sd, p + ".attn.proj")},
            "norm2": _ln(sd, p + ".norm2"),
            "cross_attn": {
                "projq": _lin(sd, p + ".cross_attn.projq"),
                "projk": _lin(sd, p + ".cross_attn.projk"),
                "projv": _lin(sd, p + ".cross_attn.projv"),
                "proj": _lin(sd, p + ".cross_attn.proj"),
            },
            "norm3": _ln(sd, p + ".norm3"),
            "norm_y": _ln(sd, p + ".norm_y"),
            "mlp": _mlp(sd, p + ".mlp"),
        }

    import jax

    params = {
        "patch_embed": {"proj": _conv(sd, "patch_embed.proj")},
        "enc_blocks": _stack([_enc_block(sd, f"enc_blocks.{i}") for i in range(n_enc)]),
        "enc_norm": _ln(sd, "enc_norm"),
        "decoder_embed": _lin(sd, "decoder_embed"),
        "dec_blocks": _stack([cross_block(f"dec_blocks.{i}") for i in range(n_dec)]),
        "dec_blocks2": _stack([cross_block(f"dec_blocks2.{i}") for i in range(n_dec)]),
        "dec_norm": _ln(sd, "dec_norm"),
        "head1": _dpt(sd, "downstream_head1.dpt", "regression"),
        "head2": _dpt(sd, "downstream_head2.dpt", "regression"),
    }
    return jax.tree.map(jnp.asarray, params)


def mast3r_to_vicasplat_params(sd: Dict[str, np.ndarray], params: dict,
                               drop_conf: bool = True) -> dict:
    """Overlay matching MASt3R/DUSt3R weights onto an initialized VicaSplat
    pytree: encoder trunk, decoder self/cross attention + mlps, center head.

    (parity: reference src/misc/weight_modify.py:144-203 — keys present in
    the target keep their values; VicaNet-only params (camera tokens,
    modulations, mlp_cam, gs head) keep their fresh init; the teacher's conf
    output channel is sliced off when the student head has none.)
    """
    import copy

    import jax

    params = copy.deepcopy(jax.tree.map(np.asarray, params))
    bb = params["backbone"]

    bb["patch_embed"]["proj"] = jax.tree.map(
        np.asarray, _conv(sd, "patch_embed.proj")
    )
    bb["enc_norm"] = _ln(sd, "enc_norm")
    bb["decoder_embed"] = _lin(sd, "decoder_embed")
    bb["dec_norm"] = _ln(sd, "dec_norm")

    n_enc = bb["enc_blocks"]["norm1"]["scale"].shape[0]
    enc = _stack([_enc_block(sd, f"enc_blocks.{i}") for i in range(n_enc)])
    bb["enc_blocks"] = jax.tree.map(np.asarray, enc)

    n_dec = bb["dec_blocks"]["norm1"]["scale"].shape[0]
    for i in range(n_dec):
        p = f"dec_blocks.{i}"
        for name, val in (
            ("norm1", _ln(sd, p + ".norm1")),
            ("norm2", _ln(sd, p + ".norm2")),
            ("norm3", _ln(sd, p + ".norm3")),
        ):
            for leaf, x in val.items():
                bb["dec_blocks"][name][leaf][i] = x
        for leaf, x in _lin(sd, p + ".attn.qkv").items():
            bb["dec_blocks"]["attn"]["qkv"][leaf][i] = x
        for leaf, x in _lin(sd, p + ".attn.proj").items():
            bb["dec_blocks"]["attn"]["proj"][leaf][i] = x
        if "cross_attn" in bb["dec_blocks"]:
            for sub in ("projq", "projk", "projv", "proj"):
                for leaf, x in _lin(sd, p + f".cross_attn.{sub}").items():
                    bb["dec_blocks"]["cross_attn"][sub][leaf][i] = x
        for sub in ("fc1", "fc2"):
            for leaf, x in _lin(sd, p + f".mlp.{sub}").items():
                bb["dec_blocks"]["mlp"][sub][leaf][i] = x

    head = _dpt(sd, "downstream_head1.dpt", "regression")
    tgt_out = params["center_head"]["head"]["conv3"]["b"].shape[0]
    src_out = head["head"]["conv3"]["b"].shape[0]
    if drop_conf and src_out == tgt_out + 1:
        head["head"]["conv3"]["w"] = head["head"]["conv3"]["w"][..., :tgt_out]
        head["head"]["conv3"]["b"] = head["head"]["conv3"]["b"][:tgt_out]
    params["center_head"] = head

    return jax.tree.map(jnp.asarray, params)
