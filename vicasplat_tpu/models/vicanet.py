"""VicaNet backbone, TPU-native.

Architecture (parity target: reference src/model/encoder/backbone/
backbone_vica.py):
  - per-frame ViT-L encoder (24 blocks, dim 1024, 16 heads, 2D RoPE base 100),
    frames folded into batch; optional camera-intrinsic embedding token
    (Linear 9->1024) appended to the 256 patch tokens at grid position (h, 0)
  - a 12-block "mix" video decoder (dim 768, 12 heads) with per-frame
    learnable camera tokens, AdaLN modulation of image tokens conditioned on
    the camera token, joint video-camera attention over all T*(N+1) tokens
    (blocked-causal mask for camera queries, 1D temporal RoPE theta~30 on
    camera q/k), and an O(T) cross-neighbor attention term

TPU design notes:
  - blocks are *stacked* pytrees scanned with lax.scan (single compile of one
    block, weights streamed from HBM), with optional jax.checkpoint remat
  - RoPE cos/sin are precomputed constants fused into the elementwise graph
  - attention uses XLA's fused SDPA; sequence lengths here are <= T*(N+1)
    ~ 2056 tokens, far below where a custom flash kernel pays off
  - all matmuls run in a configurable compute dtype (bfloat16 on TPU),
    layernorms in float32
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rope as rope_lib
from .moe import moe_init, moe_mlp
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
    normal_init,
    sdpa,
    xavier_uniform,
)


@dataclasses.dataclass(frozen=True)
class VicaNetConfig:
    img_size: int = 256
    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    mlp_ratio: float = 4.0
    temporal_rope_theta: float = 30.0
    rope_dim_list: tuple = (32, 32)
    spatial_rope_base: float = 100.0
    use_blocked_causal_attention: bool = True
    use_framewise_modulation: bool = True
    use_cross_neighbor_attention: bool = True
    use_intrinsic_embedding: bool = True
    # Pallas flash kernel for the decoder's joint image-token attention
    # (TPU only; the einsum path is used on other backends and for the tiny
    # camera-query attention). Numerically the same softmax(QK^T)V in f32.
    use_flash_attention: bool = True
    # Flash for the per-frame ENCODER attention too (opt-in until job 046
    # sizes it): 257 tokens pad to 512 inside the kernel; saves the f32
    # logits HBM round-trip at trivial padded-MXU cost.
    enc_use_flash_attention: bool = False
    # >0 replaces the decoder image-stream MLP with a top-k-routed
    # mixture-of-experts FFN (models/moe.py; beyond reference — the
    # VicaSplat family is dense). Shardable over an "expert" mesh axis
    # via parallel/ep.py.
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def n_patches(self) -> int:
        return self.grid * self.grid

    @property
    def n_tokens(self) -> int:
        return self.n_patches + (1 if self.use_intrinsic_embedding else 0)

    @property
    def enc_head_dim(self) -> int:
        return self.enc_embed_dim // self.enc_num_heads

    @property
    def dec_head_dim(self) -> int:
        return self.dec_embed_dim // self.dec_num_heads


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _attn_init(key, dim):
    k1, k2 = jax.random.split(key)
    return {
        "qkv": linear_init(k1, dim, 3 * dim, bias=True),
        "proj": linear_init(k2, dim, dim, bias=True),
    }


def _cross_attn_init(key, dim):
    ks = jax.random.split(key, 4)
    return {
        "projq": linear_init(ks[0], dim, dim, bias=True),
        "projk": linear_init(ks[1], dim, dim, bias=True),
        "projv": linear_init(ks[2], dim, dim, bias=True),
        "proj": linear_init(ks[3], dim, dim, bias=True),
    }


def _enc_block_init(key, cfg: VicaNetConfig):
    k1, k2 = jax.random.split(key)
    d = cfg.enc_embed_dim
    return {
        "norm1": layernorm_init(d),
        "attn": _attn_init(k1, d),
        "norm2": layernorm_init(d),
        "mlp": mlp_init(k2, d, int(d * cfg.mlp_ratio)),
    }


def _dec_block_init(key, cfg: VicaNetConfig):
    ks = jax.random.split(key, 4)
    d = cfg.dec_embed_dim
    p = {
        "cam_norm1": layernorm_init(d),
        "norm1": layernorm_init(d),
        "attn": _attn_init(ks[0], d),
        "cam_norm2": layernorm_init(d),
        "norm3": layernorm_init(d),
        "mlp": (
            mlp_init(ks[1], d, int(d * cfg.mlp_ratio))
            if cfg.moe_experts == 0
            else moe_init(ks[1], d, int(d * cfg.mlp_ratio), cfg.moe_experts)
        ),
        "mlp_cam": mlp_init(ks[2], d, int(d * cfg.mlp_ratio)),
    }
    if cfg.use_framewise_modulation:
        # zero-init so modulation starts as identity
        p["modulation1"] = {"proj": linear_init(None, d, 3 * d, zero=True)}
        n2 = 6 if cfg.use_cross_neighbor_attention else 3
        p["modulation2"] = {"proj": linear_init(None, d, n2 * d, zero=True)}
    if cfg.use_cross_neighbor_attention:
        p["norm2"] = layernorm_init(d)
        p["cross_attn"] = _cross_attn_init(ks[3], d)
    return p


def init_vicanet(key, cfg: VicaNetConfig):
    keys = jax.random.split(key, 8)
    d_e, d_d = cfg.enc_embed_dim, cfg.dec_embed_dim
    ps = cfg.patch_size

    enc_keys = jax.random.split(keys[0], cfg.enc_depth)
    dec_keys = jax.random.split(keys[1], cfg.dec_depth)
    params = {
        "patch_embed": {"proj": conv_init(keys[2], ps, ps, 3, d_e)},
        "enc_blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_enc_block_init(k, cfg) for k in enc_keys],
        ),
        "enc_norm": layernorm_init(d_e),
        "decoder_embed": linear_init(keys[3], d_e, d_d, bias=True),
        "camera_extrinsic_token": normal_init(keys[4], (d_d,), std=0.02),
        "camera_intrinsic_token": normal_init(keys[5], (d_d,), std=0.02),
        "dec_blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_dec_block_init(k, cfg) for k in dec_keys],
        ),
        "dec_norm": layernorm_init(d_d),
        "camera_dec_norm": layernorm_init(d_d),
    }
    # patch-embed kernel init: xavier over flattened (out, -1), like ViT
    w = params["patch_embed"]["proj"]["w"]
    fan_out, fan_in = w.shape[-1], ps * ps * 3
    params["patch_embed"]["proj"]["w"] = xavier_uniform(
        keys[6], w.shape, fan_in=fan_in, fan_out=fan_out
    )
    if cfg.use_intrinsic_embedding:
        params["intrinsic_encoder"] = linear_init(keys[7], 9, d_e, bias=True)
    return params


# ---------------------------------------------------------------------------
# static tables (positions, rope, masks) — computed at trace time
# ---------------------------------------------------------------------------

def _spatial_rope_tables(cfg: VicaNetConfig, head_dim: int,
                         grid_hw: Optional[tuple] = None):
    """(cos, sin) of shape (n_tokens, head_dim); intrinsic token at (gh, 0).

    grid_hw defaults to the square config grid; rectangular (landscape)
    inputs pass their own (gh, gw).
    """
    gh, gw = grid_hw if grid_hw is not None else (cfg.grid, cfg.grid)
    pos = rope_lib.grid_positions(gh, gw)
    if cfg.use_intrinsic_embedding:
        pos = np.concatenate([pos, np.array([[gh, 0]])], axis=0)
    return rope_lib.make_rope_2d_tables(pos, head_dim, base=cfg.spatial_rope_base)


def _temporal_rope_tables(cfg: VicaNetConfig, T: int):
    return rope_lib.make_rope_nd_tables(
        [cfg.dec_head_dim], [T], theta=cfg.temporal_rope_theta
    )


def camera_blocked_causal_mask(T: int, n_tokens: int, first_token_full_attn: bool):
    """(T, T*(1+n_tokens)) boolean mask for camera queries over the fused
    frame-major [cam_t, img_t...] key sequence. True = attend.

    (parity: reference backbone_vica.py:585-593)
    """
    frame = np.tril(np.ones((T, T), dtype=bool))
    if first_token_full_attn:
        frame[0, :] = True
    mask = np.repeat(frame, 1 + n_tokens, axis=1)
    return jnp.asarray(mask)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _flash_unmasked(q, k, v):
    """Unmasked attention via the Pallas TPU flash kernel.

    q: (B, Sq, H, D) with Sq % 128 == 0; k/v: (B, Sk, H, D), any Sk (padded
    to a lane multiple with segment-masked dummy keys). Avoids materializing
    the (H, Sq, Sk) logits in HBM — at the mix decoder's (1, 2056, 12, 64)
    joint-attention shape the logits round-trip ~0.4 GB/block through HBM,
    which dominates the block (measured, tools/jobs/023-025).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention,
    )

    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    # pad to multiples of 512 so block_q/block_k can be 512: with 128-sized
    # kv blocks (forced when padded length is 17*128) the kernel ran 2x
    # SLOWER than the einsum path; at 512 blocks it is ~3x faster than
    # einsum on (1, 2056, 12, 64) (tools/jobs/029_flash_tuned)
    pad_q = (-Sq) % 512
    pad_k = (-Sk) % 512
    if pad_q or pad_k:
        # padded queries and keys share segment id 1, so padded rows softmax
        # over the dummy keys (finite forward, zero cotangent) instead of an
        # empty set (NaN stats would poison the backward's dk/dv sums)
        def padded(x, n):
            return jnp.concatenate(
                [x, jnp.zeros((B, n, H, D), x.dtype)], axis=1)

        def seg_ids(s, n):
            return jnp.concatenate(
                [jnp.zeros((B, s), jnp.int32), jnp.ones((B, n), jnp.int32)],
                axis=1)

        seg = SegmentIds(q=seg_ids(Sq, pad_q), kv=seg_ids(Sk, pad_k))
        q = padded(q, pad_q)
        k = padded(k, pad_k)
        v = padded(v, pad_k)
    else:
        seg = None
    bq = min(512, Sq + pad_q)
    bk = min(512, Sk + pad_k)
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    out = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), segment_ids=seg,
        sm_scale=1.0 / math.sqrt(D), block_sizes=bs,
    )
    return out.transpose(0, 2, 1, 3)[:, :Sq]


def _use_flash(cfg) -> bool:
    return cfg.use_flash_attention and jax.default_backend() == "tpu"


def _split_qkv(qkv, n_heads):
    *lead, three_c = qkv.shape
    c = three_c // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    def heads(x):
        return x.reshape(*lead, n_heads, c // n_heads)
    return heads(q), heads(k), heads(v)


def _enc_block_apply(p, x, cos, sin, n_heads, dtype, flash=False):
    """One ViT encoder block. x: (B, N, C); rope tables (N, D).

    flash=True routes the per-frame attention through the Pallas flash
    kernel (queries padded 257 -> 512 with segment-masked dummies): the
    padded MXU work is trivial (~9 GF/block) but the einsum path's f32
    logits (B*T, H, 257, 257) never round-trip HBM (job 046 measures it).
    """
    h = layernorm(p["norm1"], x)
    q, k, v = _split_qkv(linear(p["attn"]["qkv"], h, dtype), n_heads)
    # rope over tokens: (B, N, H, D) with tables (N, 1, D)
    q = rope_lib.apply_rope_2d(q, cos[:, None, :], sin[:, None, :])
    k = rope_lib.apply_rope_2d(k, cos[:, None, :], sin[:, None, :])
    a = (_flash_unmasked(q, k, v) if flash else sdpa(q, k, v)).reshape(x.shape)
    x = x + linear(p["attn"]["proj"], a, dtype)
    x = x + mlp(p["mlp"], layernorm(p["norm2"], x), dtype)
    return x


def _neighbor_kv(k, v, T: int):
    """Cross-neighbor key/value construction along the frame axis.

    k, v: (B, T, N, H, D). Returns (B, T, Nk, H, D) where each frame's keys
    are its adjacent frames' tokens (T==2: the other frame; T>2: prev+next
    concatenated, boundary frames see their single neighbor twice).
    (parity: reference backbone_vica.py:173-186)
    """
    if T == 2:
        return jnp.roll(k, 1, axis=1), jnp.roll(v, 1, axis=1)
    prev_k, next_k = jnp.roll(k, 1, axis=1), jnp.roll(k, -1, axis=1)
    prev_v, next_v = jnp.roll(v, 1, axis=1), jnp.roll(v, -1, axis=1)
    prev_k = prev_k.at[:, 0].set(next_k[:, 0])
    prev_v = prev_v.at[:, 0].set(next_v[:, 0])
    next_k = next_k.at[:, -1].set(prev_k[:, -1])
    next_v = next_v.at[:, -1].set(prev_v[:, -1])
    return (
        jnp.concatenate([prev_k, next_k], axis=2),
        jnp.concatenate([prev_v, next_v], axis=2),
    )


def _modulation(p, cam_normed, n_mods, dtype):
    h = jax.nn.silu(cam_normed.astype(jnp.float32)).astype(cam_normed.dtype)
    out = linear(p["proj"], h, dtype)  # (B, T, n_mods*C)
    return jnp.split(out[:, :, None, :], n_mods, axis=-1)  # each (B, T, 1, C)


def _dec_block_apply(p, img, cam, cfg: VicaNetConfig, tables, dtype):
    """One MixDecoderBlock. img: (B, T, N, C); cam: (B, T, C)."""
    img, cam, _ = _dec_block_apply_aux(p, img, cam, cfg, tables, dtype)
    return img, cam


def _dec_block_apply_aux(p, img, cam, cfg: VicaNetConfig, tables, dtype,
                         ep_mesh=None):
    """_dec_block_apply + the block's MoE load-balance aux scalar (0.0 for
    the dense MLP)."""
    B, T, N, C = img.shape
    H = cfg.dec_num_heads
    cos_s, sin_s, cos_t, sin_t, cam_mask = tables

    cam_normed = layernorm(p["cam_norm1"], cam)
    if cfg.use_framewise_modulation:
        scale_sa, shift_sa, gate_sa = _modulation(p["modulation1"], cam_normed, 3, dtype)
    else:
        scale_sa = shift_sa = gate_sa = None

    img_n = layernorm(p["norm1"], img)
    if scale_sa is not None:
        img_n = img_n * (1.0 + scale_sa) + shift_sa

    # ---- joint video-camera attention ----
    q_i, k_i, v_i = _split_qkv(linear(p["attn"]["qkv"], img_n, dtype), H)
    # spatial rope per frame: tables (N, D) broadcast over (B, T, N, H, D)
    q_i = rope_lib.apply_rope_2d(q_i, cos_s[:, None, :], sin_s[:, None, :])
    k_i = rope_lib.apply_rope_2d(k_i, cos_s[:, None, :], sin_s[:, None, :])

    q_c, k_c, v_c = _split_qkv(linear(p["attn"]["qkv"], cam_normed, dtype), H)
    # temporal rope over frames: tables (T, D) on (B, T, H, D)
    q_c = _apply_temporal(q_c, cos_t, sin_t)
    k_c = _apply_temporal(k_c, cos_t, sin_t)

    # fused frame-major key sequence: [cam_t, img_t...] per frame
    k_f = jnp.concatenate([k_c[:, :, None], k_i], axis=2).reshape(B, T * (N + 1), H, -1)
    v_f = jnp.concatenate([v_c[:, :, None], v_i], axis=2).reshape(B, T * (N + 1), H, -1)

    q_if = q_i.reshape(B, T * N, H, -1)
    if _use_flash(cfg):
        img_a = _flash_unmasked(q_if, k_f, v_f).reshape(B, T, N, C)
    else:
        img_a = sdpa(q_if, k_f, v_f).reshape(B, T, N, C)
    cam_a = sdpa(q_c, k_f, v_f, mask=cam_mask[None, None] if cam_mask is not None else None)
    cam_a = cam_a.reshape(B, T, C)

    img_a = linear(p["attn"]["proj"], img_a, dtype)
    cam_a = linear(p["attn"]["proj"], cam_a, dtype)

    img = img + (img_a if gate_sa is None else (1.0 + gate_sa) * img_a)
    cam = cam + cam_a

    # ---- cross-neighbor attention + MLP, both AdaLN-modulated ----
    cam_normed = layernorm(p["cam_norm2"], cam)
    if cfg.use_framewise_modulation:
        if cfg.use_cross_neighbor_attention:
            (scale_ca, shift_ca, gate_ca, scale_m, shift_m, gate_m) = _modulation(
                p["modulation2"], cam_normed, 6, dtype
            )
        else:
            scale_ca = shift_ca = gate_ca = None
            scale_m, shift_m, gate_m = _modulation(p["modulation2"], cam_normed, 3, dtype)
    else:
        scale_ca = shift_ca = gate_ca = scale_m = shift_m = gate_m = None

    if cfg.use_cross_neighbor_attention:
        img_n = layernorm(p["norm2"], img)
        if scale_ca is not None:
            img_n = img_n * (1.0 + scale_ca) + shift_ca
        ca = p["cross_attn"]
        q = linear(ca["projq"], img_n, dtype).reshape(B, T, N, H, -1)
        k = linear(ca["projk"], img_n, dtype).reshape(B, T, N, H, -1)
        v = linear(ca["projv"], img_n, dtype).reshape(B, T, N, H, -1)
        q = rope_lib.apply_rope_2d(q, cos_s[:, None, :], sin_s[:, None, :])
        k = rope_lib.apply_rope_2d(k, cos_s[:, None, :], sin_s[:, None, :])
        k_n, v_n = _neighbor_kv(k, v, T)
        nk = k_n.shape[2]
        out = sdpa(
            q.reshape(B * T, N, H, -1),
            k_n.reshape(B * T, nk, H, -1),
            v_n.reshape(B * T, nk, H, -1),
        ).reshape(B, T, N, C)
        out = linear(ca["proj"], out, dtype)
        img = img + (out if gate_ca is None else (1.0 + gate_ca) * out)

    img_n = layernorm(p["norm3"], img)
    if scale_m is not None:
        img_n = img_n * (1.0 + scale_m) + shift_m
    if "router" in p["mlp"]:
        img_m, moe_aux = moe_mlp(
            p["mlp"], img_n, top_k=cfg.moe_top_k,
            capacity_factor=cfg.moe_capacity_factor, dtype=dtype,
            ep_mesh=ep_mesh, return_aux=True,
        )
    else:
        img_m = mlp(p["mlp"], img_n, dtype)
        moe_aux = jnp.float32(0.0)
    img = img + (img_m if gate_m is None else (1.0 + gate_m) * img_m)

    cam = cam + mlp(p["mlp_cam"], cam_normed, dtype)
    return img, cam, moe_aux


def _apply_temporal(x, cos_t, sin_t):
    """x: (B, T, H, D); tables (T, D) -> broadcast over heads."""
    return rope_lib.apply_rope_interleaved(x, cos_t[:, None, :], sin_t[:, None, :])


def vicanet_forward(
    params,
    cfg: VicaNetConfig,
    images: jnp.ndarray,  # (B, T, H, W, 3) NHWC, normalized to [-1, 1]
    intrinsics: Optional[jnp.ndarray] = None,  # (B, T, 3, 3) normalized K
    *,
    dtype=jnp.bfloat16,
    remat: bool = False,
    remat_policy: Optional[str] = None,
    pipeline_mesh=None,
    pipeline_n_micro: Optional[int] = None,
    sp_mesh=None,
    ep_mesh=None,
    return_moe_aux: bool = False,
):
    """Returns (x_final, camera_extrinsic_tokens, camera_intrinsic_tokens,
    intermediates) where intermediates = [enc_out(1024-d)] + 12 decoder block
    outputs (768-d, last one normed), each (B, T, n_patches, C) with the
    intrinsic token stripped. (parity: reference backbone_vica.py:526-582)

    sp_mesh: a ("data", "seq") mesh (parallel/sp.py) — sequence parallelism:
    activations carry a tokens-over-"seq" sharding constraint at every block
    boundary; GSPMD shards the LN/MLP/RoPE work and all-gathers K/V for the
    attention contractions. Mutually exclusive with pipeline_mesh; forces
    the einsum attention path (the Pallas flash kernel would need an
    explicit shard_map wrapper).

    ep_mesh: a ("data", "expert") mesh (parallel/ep.py) — expert
    parallelism for MoE decoder MLPs (cfg.moe_experts > 0). Params must be
    sharded with parallel/ep.shard_params_ep. return_moe_aux=True appends
    the mean per-block load-balance loss to the return tuple (training
    regularizer; 1.0 at perfect balance).
    """
    if sp_mesh is not None:
        assert pipeline_mesh is None, "sp_mesh and pipeline_mesh are exclusive"
        assert ep_mesh is None, (
            "sp_mesh and ep_mesh are exclusive (one mesh per forward; a "
            "combined ('data','seq','expert') mesh is untested)"
        )
        import dataclasses as _dc

        from ..parallel.sp import sp_shard_batch_only, sp_shard_tokens

        if cfg.use_flash_attention:
            cfg = _dc.replace(cfg, use_flash_attention=False)
    else:
        sp_shard_tokens = lambda x, m, token_axis=-2: x  # noqa: E731
        sp_shard_batch_only = lambda x, m: x  # noqa: E731
    B, T, Himg, Wimg, _ = images.shape
    # grids derive from the actual input (landscape rectangles supported;
    # portrait batches are transposed before this — see
    # vicasplat.transpose_to_landscape)
    gh, gw = Himg // cfg.patch_size, Wimg // cfg.patch_size
    n_patches = gh * gw
    N = n_patches + (1 if cfg.use_intrinsic_embedding else 0)

    # --- patch embed (per frame); reshape+matmul form avoids the MXU's
    # 3->128 input-channel padding waste (see layers.conv2d_patchify) ---
    x = images.reshape(B * T, Himg, Wimg, 3)
    x = conv2d_patchify(params["patch_embed"]["proj"], x, cfg.patch_size,
                        dtype=dtype)
    x = x.reshape(B * T, n_patches, cfg.enc_embed_dim)

    if cfg.use_intrinsic_embedding:
        assert intrinsics is not None, "backbone configured with intrinsic embedding"
        emb = linear(
            params["intrinsic_encoder"], intrinsics.reshape(B, T, 9), dtype
        ).reshape(B * T, 1, cfg.enc_embed_dim)
        x = jnp.concatenate([x, emb], axis=1)

    # --- encoder: scan over stacked blocks ---
    cos_e, sin_e = _spatial_rope_tables(cfg, cfg.enc_head_dim, (gh, gw))

    # remat_policy="dots": save matmul outputs across the scan boundary and
    # recompute only elementwise/norm work in the backward — the MXU work
    # (the majority of block time) runs once instead of twice, for ~2-3 GB
    # of saved activations at flagship scale (fits beside the 9.2 GB
    # params+moments+grads). None = save nothing (lowest memory).
    _policy = (
        jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        if remat_policy == "dots" else None
    )

    x = sp_shard_tokens(x, sp_mesh)

    enc_flash = (cfg.enc_use_flash_attention
                 and jax.default_backend() == "tpu" and sp_mesh is None)

    def enc_step(h, blk):
        h = _enc_block_apply(blk, h, cos_e, sin_e, cfg.enc_num_heads, dtype,
                             flash=enc_flash)
        return sp_shard_tokens(h, sp_mesh), None

    step = jax.checkpoint(enc_step, policy=_policy) if remat else enc_step
    if pipeline_mesh is not None:
        from ..parallel.pp import pipeline_scan
    if (pipeline_mesh is not None
            and cfg.enc_depth % pipeline_mesh.shape["pipe"] == 0):
        # pipeline the deepest stack over a "pipe" mesh axis: stage-local
        # block shards, ppermute activation hops (parallel/pp.py). The
        # frame axis (B*T) supplies the microbatches.
        # on a ("pipe", "data") mesh (make_mesh_pipe_data) the microbatch
        # batch dim additionally shards over "data": PP x DP composition
        pp_da = "data" if "data" in pipeline_mesh.shape else None
        x = pipeline_scan(
            lambda h, blk: step(h, blk)[0], params["enc_blocks"], x,
            pipeline_mesh, n_micro=pipeline_n_micro, data_axis=pp_da,
        )
    else:
        x, _ = jax.lax.scan(step, x, params["enc_blocks"])
    x = layernorm(params["enc_norm"], x)

    enc_out = x.reshape(B, T, N, cfg.enc_embed_dim)

    # --- decoder ---
    img = sp_shard_tokens(linear(params["decoder_embed"], enc_out, dtype),
                          sp_mesh)
    d = cfg.dec_embed_dim
    tok_i = params["camera_intrinsic_token"].astype(img.dtype)
    tok_e = params["camera_extrinsic_token"].astype(img.dtype)
    cam = jnp.concatenate(
        [
            jnp.broadcast_to(tok_i, (B, 1, d)),
            jnp.broadcast_to(tok_i + tok_e, (B, T - 1, d)),
        ],
        axis=1,
    )

    cam = sp_shard_batch_only(cam, sp_mesh)

    cos_s, sin_s = _spatial_rope_tables(cfg, cfg.dec_head_dim, (gh, gw))
    cos_t, sin_t = _temporal_rope_tables(cfg, T)
    cam_mask = (
        camera_blocked_causal_mask(T, N, not cfg.use_intrinsic_embedding)
        if cfg.use_blocked_causal_attention
        else None
    )
    tables = (cos_s, sin_s, cos_t, sin_t, cam_mask)

    def dec_step(carry, blk):
        img, cam, aux = carry
        img, cam, a = _dec_block_apply_aux(blk, img, cam, cfg, tables,
                                           dtype, ep_mesh)
        img = sp_shard_tokens(img, sp_mesh)
        cam = sp_shard_batch_only(cam, sp_mesh)
        return (img, cam, aux + a), img

    step = jax.checkpoint(dec_step, policy=_policy) if remat else dec_step
    if (pipeline_mesh is not None
            and cfg.dec_depth % pipeline_mesh.shape["pipe"] == 0):
        assert cfg.moe_experts == 0, (
            "MoE decoder MLPs don't compose with the pipeline scan; "
            "use ep_mesh instead of pipeline_mesh"
        )

        def dec_step2(carry, blk):
            img, cam = carry
            img, cam = _dec_block_apply(blk, img, cam, cfg, tables, dtype)
            return (img, cam), img

        step2 = (jax.checkpoint(dec_step2, policy=_policy) if remat
                 else dec_step2)
        # decoder attention is joint over all frames, so only the example
        # axis B microbatches (B=1 still gets the S-fold param-memory win,
        # just no bubble overlap); per-block outputs are the DPT hooks.
        import math as _math

        n_req = pipeline_n_micro or pipeline_mesh.shape["pipe"]
        pp_da = "data" if "data" in pipeline_mesh.shape else None
        b_eff = B // pipeline_mesh.shape["data"] if pp_da else B
        (img, cam), inter = pipeline_scan(
            step2, params["dec_blocks"], (img, cam), pipeline_mesh,
            n_micro=max(1, _math.gcd(b_eff, n_req)), collect_outputs=True,
            data_axis=pp_da,
        )
        moe_aux = jnp.float32(0.0)
    else:
        (img, cam, moe_aux), inter = jax.lax.scan(
            step, (img, cam, jnp.float32(0.0)), params["dec_blocks"]
        )
    moe_aux = moe_aux / cfg.dec_depth

    # intermediates: [enc_out] + per-block outputs, last one layer-normed
    intermediates = [enc_out] + [inter[i] for i in range(cfg.dec_depth)]
    intermediates[-1] = layernorm(params["dec_norm"], intermediates[-1])
    cam = layernorm(params["camera_dec_norm"], cam)

    if cfg.use_intrinsic_embedding:
        intermediates = [t[:, :, :-1] for t in intermediates]
        camera_intrinsic = None
        camera_extrinsic = cam[:, 1:]
    else:
        camera_intrinsic = cam[:, 0]
        camera_extrinsic = cam[:, 1:]

    out = (intermediates[-1], camera_extrinsic, camera_intrinsic,
           intermediates)
    return out + (moe_aux,) if return_moe_aux else out
