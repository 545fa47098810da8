"""Functional NN building blocks: params are plain pytrees (nested dicts of
jnp arrays), forward passes are pure functions.

Conventions (chosen for TPU/XLA, not torch):
  - Linear kernels are (in, out) — `y = x @ w + b`.
  - Convs use NHWC activations and HWIO kernels (XLA's native TPU layout).
  - Params are stored float32; compute dtype is a caller choice (`cast`).
  - LayerNorm always computes in float32.

The torch-checkpoint converter (utils/ckpt_convert.py) transposes torch's
(out, in) / OIHW weights into these layouts.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def xavier_uniform(key, shape, dtype=jnp.float32, fan_in=None, fan_out=None):
    """Xavier/Glorot uniform. For (in, out) linear kernels fan is inferred;
    for conv kernels pass fans explicitly."""
    if fan_in is None:
        fan_in = shape[0]
    if fan_out is None:
        fan_out = shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def normal_init(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------

def linear_init(key, d_in, d_out, bias=True, zero=False):
    if zero:
        w = jnp.zeros((d_in, d_out), jnp.float32)
    else:
        w = xavier_uniform(key, (d_in, d_out))
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def linear(p, x, dtype=None):
    if "w_q" in p:  # int8-prepared weights (ops/quant.quantize_tree)
        from ..ops.quant import linear_w8a8

        return linear_w8a8(p, x, dtype=dtype)
    w = p["w"]
    if dtype is not None:
        w = w.astype(dtype)
        x = x.astype(dtype)
    y = x @ w
    if "b" in p:
        b = p["b"].astype(y.dtype)
        y = y + b
    return y


# ---------------------------------------------------------------------------
# layer norm (float32 compute)
# ---------------------------------------------------------------------------

def layernorm_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layernorm(p, x, eps=1e-6):
    orig = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(orig)


# ---------------------------------------------------------------------------
# MLP (ViT-style: fc1 -> gelu -> fc2)
# ---------------------------------------------------------------------------

def mlp_init(key, dim, hidden):
    k1, k2 = jax.random.split(key)
    return {"fc1": linear_init(k1, dim, hidden), "fc2": linear_init(k2, hidden, dim)}


def mlp(p, x, dtype=None):
    h = linear(p["fc1"], x, dtype)
    h = jax.nn.gelu(h, approximate=False)
    return linear(p["fc2"], h, dtype)


# ---------------------------------------------------------------------------
# conv2d (NHWC, HWIO)
# ---------------------------------------------------------------------------

def conv_init(key, kh, kw, c_in, c_out, bias=True):
    fan_in = kh * kw * c_in
    fan_out = kh * kw * c_out
    w = xavier_uniform(key, (kh, kw, c_in, c_out), fan_in=fan_in, fan_out=fan_out)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((c_out,), jnp.float32)
    return p


def conv2d(p, x, stride=1, padding="SAME", dtype=None):
    w = p["w"]
    if dtype is not None:
        w = w.astype(dtype)
        x = x.astype(dtype)
    strides = (stride, stride) if isinstance(stride, int) else stride
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def conv2d_im2col(p, x, kernel: int, dtype=None):
    """SAME-padded stride-1 conv as explicit patches + one matmul.

    For low input-channel counts (RGB) the MXU conv path pads channels to
    the 128-lane width — a ~42x FLOP waste for a 3-channel 7x7 conv
    (measured: the DPT-GS input_merger alone cost ~8 ms / 8 frames).
    im2col makes the contraction dense: (N,H,W,k*k*C) @ (k*k*C, O).
    """
    w = p["w"]  # (kh, kw, I, O)
    kh = kw = kernel
    n, h, wd, c = x.shape
    o = w.shape[-1]
    if dtype is not None:
        w = w.astype(dtype)
        x = x.astype(dtype)
    ph = kh // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (ph, ph), (0, 0)))
    patches = jnp.concatenate(
        [xp[:, i: i + h, j: j + wd, :] for i in range(kh) for j in range(kw)],
        axis=-1,
    )  # (N, H, W, kh*kw*C) in (i, j, c) order — matches HWIO reshape
    y = patches.reshape(-1, kh * kw * c) @ w.reshape(kh * kw * c, o)
    y = y.reshape(n, h, wd, o)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def conv2d_patchify(p, x, patch: int, dtype=None):
    """Non-overlapping kxk stride-k conv (patch embed) as reshape + matmul —
    avoids the same low-channel MXU padding waste as conv2d_im2col."""
    w = p["w"]  # (k, k, I, O)
    n, h, wd, c = x.shape
    o = w.shape[-1]
    if dtype is not None:
        w = w.astype(dtype)
        x = x.astype(dtype)
    gh, gw = h // patch, wd // patch
    xr = x.reshape(n, gh, patch, gw, patch, c)
    xr = xr.transpose(0, 1, 3, 2, 4, 5).reshape(n, gh * gw, patch * patch * c)
    y = xr @ w.reshape(patch * patch * c, o)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y.reshape(n, gh, gw, o)


def conv2d_s2d(p, x, kernel: int, s: int = 4, dtype=None):
    """SAME-padded stride-1 low-channel conv via space-to-depth.

    The MXU conv path pads input channels to 128 lanes, so a 7x7 RGB conv
    wastes ~42x FLOPs; the im2col form fixes the padding but pays ~3 ms of
    49-slice concat bandwidth (measured, tools/jobs/021). Instead fold s*s
    spatial positions into channels (3 -> 48 at s=4), run ONE dense conv
    whose kernel is the exact block-space rearrangement of the original
    (kh' = ceil(k/s)+1 taps), and unfold the s*s output phases back to
    space. Exactly equivalent to conv2d(p, x, padding="SAME"-centered) for
    odd kernels; ~8x faster than im2col for the 7x7 RGB merger.
    """
    n, h, wd, _ = x.shape
    y = conv2d_s2d_folded(p, x, kernel, s=s, dtype=dtype)
    o = y.shape[-1]
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, wd, o)
    return y


def conv2d_s2d_folded(p, x, kernel: int, s: int = 4, dtype=None):
    """conv2d_s2d WITHOUT the final depth-to-space: returns the block-space
    output (n, h/s, w/s, s, s, O) — phase axes (dy, dx) explicit. Callers
    that consume the result elementwise (e.g. the DPT gs-head merger add)
    can stay in folded space and defer the 134 MB reshuffle until after the
    fusion boundary. d2s is `y.transpose(0, 1, 3, 2, 4, 5).reshape(n,h,w,O)`.
    """
    w = p["w"]  # (k, k, C, O)
    k = kernel
    assert k % 2 == 1, "centered SAME padding requires an odd kernel"
    n, h, wd, c = x.shape
    o = w.shape[-1]
    if dtype is not None:
        w = w.astype(dtype)
        x = x.astype(dtype)
    assert h % s == 0 and wd % s == 0
    hb, wb = h // s, wd // s
    pad = k // 2

    # block-space kernel extent: a + u - pad for a,u in [0,s)x[0,k) spans
    # [-pad, s - 1 + k - 1 - pad]; kh = floor(./s)
    kh_lo = -(pad // s) - (1 if pad % s else 0)
    kh_hi = (s - 2 + k - pad) // s
    kt = kh_hi - kh_lo + 1  # taps per axis in block space

    # W_s2d[kh, kw, dy, dx, c, a, b, o] = W[s*kh + dy - a + pad,
    #                                       s*kw + dx - b + pad, c, o]
    idx = (
        s * (jnp.arange(kt) + kh_lo)[:, None, None]
        + jnp.arange(s)[None, :, None]
        - jnp.arange(s)[None, None, :]
        + pad
    )  # (kt, s, s) -> u
    valid = (idx >= 0) & (idx < k)
    idx_c = jnp.clip(idx, 0, k - 1)
    # gather along both kernel axes
    wk = w[idx_c]  # (kt, s_dy, s_a, k, C, O)
    wk = jnp.moveaxis(wk, 3, 0)[idx_c]  # (kt, s_dx, s_b, kt, s_dy, s_a, C, O)
    wk = wk * valid[:, :, :, None, None, None, None, None]
    wk = wk * valid[None, None, None, :, :, :, None, None]
    # -> (kt_h, kt_w, dy, dx, C, a, b, O)
    wk = wk.transpose(3, 0, 4, 1, 6, 5, 2, 7)
    w2 = wk.reshape(kt, kt, s * s * c, s * s * o)
    # NOTE axis order: input s2d channels are (dy, dx, c); output (a, b, o)

    xs = x.reshape(n, hb, s, wb, s, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, hb, wb, s * s * c)
    y = jax.lax.conv_general_dilated(
        xs, w2, (1, 1), ((-kh_lo, kh_hi), (-kh_lo, kh_hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (n, hb, wb, s*s*o)
    y = y.reshape(n, hb, wb, s, s, o)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def conv_transpose2d(p, x, stride, dtype=None):
    """Transposed conv with kernel size == stride (the DPT up-projections).

    Kernel layout is (kh, kw, OUT, IN) with transpose_kernel=True — the
    gradient-of-conv form, which matches torch ConvTranspose2d exactly
    (see tests/test_parity_torch.py).
    """
    w = p["w"]
    if dtype is not None:
        w = w.astype(dtype)
        x = x.astype(dtype)
    strides = (stride, stride) if isinstance(stride, int) else stride
    y = jax.lax.conv_transpose(
        x, w, strides=strides, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# bilinear resize with align_corners=True (DPT fusion path semantics)
# ---------------------------------------------------------------------------

def resize_bilinear_align_corners(x: jnp.ndarray, out_hw: Sequence[int]) -> jnp.ndarray:
    """NHWC bilinear resize, align_corners=True (torch F.interpolate semantics
    used throughout the reference's DPT head). jax.image.resize only does
    half-pixel centers, so this builds the interpolation as two small matmuls
    (H and W separably) — MXU-friendly and exactly linear/differentiable."""
    n, h, w, c = x.shape
    oh, ow = out_hw

    def weight_matrix(in_size, out_size, dtype):
        if out_size == 1 or in_size == 1:
            return jnp.ones((out_size, in_size), dtype) / in_size
        pos = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 2)
        frac = pos - lo.astype(jnp.float32)
        m = jnp.zeros((out_size, in_size), jnp.float32)
        rows = jnp.arange(out_size)
        m = m.at[rows, lo].add(1.0 - frac)
        m = m.at[rows, lo + 1].add(frac)
        return m.astype(dtype)

    wh = weight_matrix(h, oh, x.dtype)
    ww = weight_matrix(w, ow, x.dtype)
    y = jnp.einsum("oh,nhwc->nowc", wh, x)
    y = jnp.einsum("pw,nowc->nopc", ww, y)
    return y


# ---------------------------------------------------------------------------
# scaled dot product attention
# ---------------------------------------------------------------------------

def sdpa(q, k, v, mask=None):
    """Attention over (B, S, H, D) tensors (BSHD layout).

    mask: broadcastable boolean (..., Sq, Sk), True = attend; softmax in
    float32. Written as explicit einsums: jax.nn.dot_product_attention's XLA
    path measured 13-22 TF/s on the mix decoder's (1, 2056, 12, 64) shape
    while the same math as two einsums measures ~90 TF/s
    (tools/jobs/024_attention_impls).
    """
    s = jnp.einsum("...qhd,...khd->...hqk", q, k) / math.sqrt(q.shape[-1])
    if mask is not None:
        s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", p, v)


def sdpa_xla(q, k, v, mask=None):
    """jax.nn.dot_product_attention reference path (kept for comparison)."""
    return jax.nn.dot_product_attention(
        q, k, v, mask=mask, scale=1.0 / math.sqrt(q.shape[-1])
    )
