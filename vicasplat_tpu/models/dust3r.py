"""DUSt3R/MASt3R two-view teacher (frozen distillation target).

Parity target: reference src/model/distiller/dust3d_backbone.py:20-226 +
croco/croco.py — a shared ViT-L/16 encoder over both views, two 12-block
cross-attention decoders (each block: self-attn, cross-attn to the *other*
view's previous-layer tokens, MLP; 2D RoPE base 100 on q/k of both), and two
DPT heads regressing pts3d (+confidence) in view-1's frame.

Used by the distillation stage (reference src/model/model_wrapper.py:249-301)
to produce pseudo-GT point maps for two anchor frames. Weights load from a
MASt3R/DUSt3R torch checkpoint via utils/ckpt_convert.convert_dust3r_
state_dict; the teacher is frozen (params held out of the optimizer).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import rope as rope_lib
from .heads import DPTConfig, dpt_regression_head, init_dpt, postprocess_conf_exp, postprocess_pts3d_exp
from .layers import (
    conv2d,
    conv2d_patchify,
    conv_init,
    layernorm,
    layernorm_init,
    linear,
    linear_init,
    mlp,
    mlp_init,
    sdpa,
)
from .vicanet import _enc_block_init, _enc_block_apply, _split_qkv


@dataclasses.dataclass(frozen=True)
class Dust3RConfig:
    img_size: int = 256  # must be multiple of 16 (512 for released ckpts)
    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    predict_conf: bool = True

    @property
    def grid(self):
        return self.img_size // self.patch_size

    @property
    def enc_head_dim(self):
        return self.enc_embed_dim // self.enc_num_heads

    @property
    def dec_head_dim(self):
        return self.dec_embed_dim // self.dec_num_heads


def _cross_block_init(key, cfg: Dust3RConfig):
    """CroCo DecoderBlock: norm1+self-attn, norm2+cross-attn(+norm_y), norm3+mlp."""
    ks = jax.random.split(key, 3)
    d = cfg.dec_embed_dim
    return {
        "norm1": layernorm_init(d),
        "attn": {
            "qkv": linear_init(ks[0], d, 3 * d, bias=True),
            "proj": linear_init(jax.random.fold_in(ks[0], 1), d, d, bias=True),
        },
        "norm2": layernorm_init(d),
        "cross_attn": {
            "projq": linear_init(ks[1], d, d, bias=True),
            "projk": linear_init(jax.random.fold_in(ks[1], 1), d, d, bias=True),
            "projv": linear_init(jax.random.fold_in(ks[1], 2), d, d, bias=True),
            "proj": linear_init(jax.random.fold_in(ks[1], 3), d, d, bias=True),
        },
        "norm3": layernorm_init(d),
        "norm_y": layernorm_init(d),
        "mlp": mlp_init(ks[2], d, int(d * cfg.mlp_ratio)),
    }


def init_dust3r(key, cfg: Dust3RConfig):
    keys = jax.random.split(key, 8)
    hook_dims = (cfg.enc_embed_dim,) + (cfg.dec_embed_dim,) * 3
    head_cfg = DPTConfig(
        hook_dims=hook_dims,
        num_channels=3 + (1 if cfg.predict_conf else 0),
        head_type="regression",
        patch_size=cfg.patch_size,
    )
    return {
        "patch_embed": {"proj": conv_init(keys[0], cfg.patch_size, cfg.patch_size, 3, cfg.enc_embed_dim)},
        "enc_blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_enc_block_init(k, _EncProxy(cfg)) for k in jax.random.split(keys[1], cfg.enc_depth)],
        ),
        "enc_norm": layernorm_init(cfg.enc_embed_dim),
        "decoder_embed": linear_init(keys[2], cfg.enc_embed_dim, cfg.dec_embed_dim),
        "dec_blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_cross_block_init(k, cfg) for k in jax.random.split(keys[3], cfg.dec_depth)],
        ),
        "dec_blocks2": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_cross_block_init(k, cfg) for k in jax.random.split(keys[4], cfg.dec_depth)],
        ),
        "dec_norm": layernorm_init(cfg.dec_embed_dim),
        "head1": init_dpt(keys[5], head_cfg),
        "head2": init_dpt(keys[6], head_cfg),
    }


class _EncProxy:
    """Adapter so vicanet's encoder-block init sees the right dims."""

    def __init__(self, cfg: Dust3RConfig):
        self.enc_embed_dim = cfg.enc_embed_dim
        self.mlp_ratio = cfg.mlp_ratio


def _cross_block_apply(p, x, y, cos, sin, n_heads, dtype):
    """x: (B, N, C) this view; y: (B, N, C) other view (previous layer)."""
    h = layernorm(p["norm1"], x)
    q, k, v = _split_qkv(linear(p["attn"]["qkv"], h, dtype), n_heads)
    q = rope_lib.apply_rope_2d(q, cos[:, None, :], sin[:, None, :])
    k = rope_lib.apply_rope_2d(k, cos[:, None, :], sin[:, None, :])
    x = x + linear(p["attn"]["proj"], sdpa(q, k, v).reshape(x.shape), dtype)

    yn = layernorm(p["norm_y"], y)
    hq = layernorm(p["norm2"], x)
    ca = p["cross_attn"]
    d = x.shape[-1]
    q = linear(ca["projq"], hq, dtype).reshape(*hq.shape[:-1], n_heads, d // n_heads)
    kk = linear(ca["projk"], yn, dtype).reshape(*yn.shape[:-1], n_heads, d // n_heads)
    vv = linear(ca["projv"], yn, dtype).reshape(*yn.shape[:-1], n_heads, d // n_heads)
    q = rope_lib.apply_rope_2d(q, cos[:, None, :], sin[:, None, :])
    kk = rope_lib.apply_rope_2d(kk, cos[:, None, :], sin[:, None, :])
    x = x + linear(ca["proj"], sdpa(q, kk, vv).reshape(x.shape), dtype)

    x = x + mlp(p["mlp"], layernorm(p["norm3"], x), dtype)
    return x


def dust3r_forward(params, cfg: Dust3RConfig, img1, img2, *, dtype=jnp.bfloat16):
    """img1/img2: (B, H, W, 3) in [-1, 1]. Returns dict with pts3d/conf for
    both views (view-1 frame)."""
    B, H, W, _ = img1.shape
    N = cfg.grid * (W // cfg.patch_size)

    def encode(img):
        x = conv2d_patchify(params["patch_embed"]["proj"], img,
                            cfg.patch_size, dtype=dtype)
        x = x.reshape(B, -1, cfg.enc_embed_dim)
        cos_e, sin_e = rope_lib.make_rope_2d_tables(
            rope_lib.grid_positions(H // cfg.patch_size, W // cfg.patch_size),
            cfg.enc_head_dim, base=cfg.rope_base,
        )

        def step(h, blk):
            return _enc_block_apply(blk, h, cos_e, sin_e, cfg.enc_num_heads, dtype), None

        x, _ = jax.lax.scan(step, x, params["enc_blocks"])
        return layernorm(params["enc_norm"], x)

    f1 = encode(img1)
    f2 = encode(img2)

    cos_d, sin_d = rope_lib.make_rope_2d_tables(
        rope_lib.grid_positions(H // cfg.patch_size, W // cfg.patch_size),
        cfg.dec_head_dim, base=cfg.rope_base,
    )

    x1 = linear(params["decoder_embed"], f1, dtype)
    x2 = linear(params["decoder_embed"], f2, dtype)

    def step(carry, blks):
        x1, x2 = carry
        b1, b2 = blks
        n1 = _cross_block_apply(b1, x1, x2, cos_d, sin_d, cfg.dec_num_heads, dtype)
        n2 = _cross_block_apply(b2, x2, x1, cos_d, sin_d, cfg.dec_num_heads, dtype)
        return (n1, n2), (n1, n2)

    (x1, x2), (inter1, inter2) = jax.lax.scan(
        step, (x1, x2), (params["dec_blocks"], params["dec_blocks2"])
    )

    hooks = (0, cfg.dec_depth * 2 // 4, cfg.dec_depth * 3 // 4, cfg.dec_depth)
    head_cfg = DPTConfig(
        hook_dims=(cfg.enc_embed_dim,) + (cfg.dec_embed_dim,) * 3,
        num_channels=3 + (1 if cfg.predict_conf else 0),
        head_type="regression",
        patch_size=cfg.patch_size,
    )
    grid_hw = (H // cfg.patch_size, W // cfg.patch_size)

    def run_head(head_params, f_enc, inter, x_final):
        toks = [f_enc]
        for hk in hooks[1:-1]:
            toks.append(inter[hk - 1])
        toks.append(layernorm(params["dec_norm"], x_final))
        out = dpt_regression_head(head_params, head_cfg, toks, grid_hw, dtype)
        res = {"pts3d": postprocess_pts3d_exp(out[..., :3])}
        if cfg.predict_conf:
            res["conf"] = postprocess_conf_exp(out[..., 3])
        return res

    out1 = run_head(params["head1"], f1, inter1, x1)
    out2 = run_head(params["head2"], f2, inter2, x2)
    return {"view1": out1, "view2": out2}
