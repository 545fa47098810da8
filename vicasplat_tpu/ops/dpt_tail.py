"""Fused DPT head tail: (x [+ merger]) -> 3x3 conv -> relu -> 1x1 conv.

Why this kernel exists (measured, tools/jobs/017/023/034/037): the DPT
heads' full-resolution tails cost ~8-11 ms in context against a ~4.3 ms
op-sum — XLA materializes three (8, 256, 256, 256) bf16 activations
(268 MB each) through layout changes around `p1_up + relu(merger(img))`
feeding conv1 (reference structure: dpt_block.py:335-343 head applied to
dpt_gs_head.py:148-151's merged path; the regression head's conv2/conv3,
dpt_block.py:325-333, is the same pattern without the merger). This kernel
consumes the addend(s) directly from HBM and writes only the
(..., num_channels) output: the sum, the conv input, and the conv output
never exist in HBM.

Design (TPU/Mosaic):
  - grid (N, H/bh): one row band per step; bands pipeline via the standard
    double-buffered BlockSpec machinery.
  - row halo WITHOUT overlapping blocks: each addend is passed three times —
    the (bh, W, C) band plus two single-row specs whose index maps pin the
    previous band's last row and the next band's first row; edge bands mask
    the halo row to zero (= SAME padding).
  - the 3x3 conv is 9 shifted (bh*W, C) @ (C, F) matmuls accumulated in
    f32 (no im2col buffer: a (bh*W, 9C) patch tensor would be ~9 MB of
    VMEM; the tap loop keeps scratch at ~3.5 MB and every matmul is an MXU
    shape).
  - the 1x1 conv (F -> O) and its bias run on the f32 accumulator before
    the single band write.

Exactness: identical math to conv2d(relu(conv2d(a [+ m]))) up to
f32-accumulation order; the wrapper carries a custom_vjp whose backward
recomputes through the XLA reference ops, so training/autodiff are
unaffected by the kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, bh: int, W: int, C: int, F: int, O: int, n_bands: int,
            has_m: bool):
    if has_m:
        (a_ref, m_ref, ap_ref, mp_ref, an_ref, mn_ref,
         w1_ref, b1_ref, w2_ref, b2_ref, out_ref, xpad_ref) = refs
    else:
        (a_ref, ap_ref, an_ref,
         w1_ref, b1_ref, w2_ref, b2_ref, out_ref, xpad_ref) = refs
    i = pl.program_id(1)

    # assemble the zero-padded (bh+2, W+2, C) conv input window
    xpad_ref[...] = jnp.zeros(xpad_ref.shape, xpad_ref.dtype)
    xpad_ref[1:bh + 1, 1:W + 1, :] = (
        a_ref[0] + m_ref[0] if has_m else a_ref[0]
    )

    @pl.when(i > 0)
    def _():
        xpad_ref[0, 1:W + 1, :] = (
            ap_ref[0, 0] + mp_ref[0, 0] if has_m else ap_ref[0, 0]
        )

    @pl.when(i < n_bands - 1)
    def _():
        xpad_ref[bh + 1, 1:W + 1, :] = (
            an_ref[0, 0] + mn_ref[0, 0] if has_m else an_ref[0, 0]
        )

    # 3x3 conv as 3 horizontally-shifted matmuls over a vertical-tap
    # concat: xv[r, c] = [x(r-1,c), x(r,c), x(r+1,c)] gives contraction
    # depth 3C=768 per matmul — measured 136 TF/s with 9 k=256 matmuls
    # (job 038); fewer, deeper matmuls feed the MXU better
    xv = jnp.concatenate(
        [xpad_ref[dy:dy + bh, :, :] for dy in range(3)], axis=-1
    )  # (bh, W+2, 3C)
    acc = jnp.zeros((bh * W, F), jnp.float32)
    for dx in range(3):
        xs = xv[:, dx:dx + W, :].reshape(bh * W, 3 * C)
        acc = acc + jax.lax.dot(
            xs, w1_ref[dx],
            preferred_element_type=jnp.float32,
        )
    acc = acc + b1_ref[0].astype(jnp.float32)
    h = jnp.maximum(acc, 0.0).astype(a_ref.dtype)
    y = jax.lax.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    y = y + b2_ref[0].astype(jnp.float32)
    out_ref[0] = y.reshape(bh, W, O).astype(out_ref.dtype)


def _pallas_tail(a, m, w1, b1, w2, b2, bh: int):
    N, H, W, C = a.shape
    F = w1.shape[-1]
    O = w2.shape[-1]
    n_bands = H // bh
    assert n_bands * bh == H, "H must be a multiple of the band height"
    has_m = m is not None
    # (dy, dx, C, F) -> per-dx vertical-tap concat (dx, 3C, F), matching
    # the kernel's xv channel order [x(r-1), x(r), x(r+1)]
    w1_taps = jnp.transpose(w1, (1, 0, 2, 3)).reshape(3, 3 * C, F)

    grid = (N, n_bands)
    spec_band = pl.BlockSpec((1, bh, W, C), lambda n, i: (n, i, 0, 0),
                             memory_space=pltpu.VMEM)
    # single-row halo specs; clamped at the edges, masked in-kernel
    spec_prev = pl.BlockSpec(
        (1, 1, W, C),
        lambda n, i: (n, jnp.maximum(i * bh - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (1, 1, W, C),
        lambda n, i: (n, jnp.minimum(i * bh + bh, (n_bands * bh) - 1), 0, 0),
        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda n, i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    if has_m:
        in_specs = [spec_band, spec_band, spec_prev, spec_prev,
                    spec_next, spec_next]
        operands = (a, m, a, m, a, m)
    else:
        in_specs = [spec_band, spec_prev, spec_next]
        operands = (a, a, a)
    in_specs += [const((3, 3 * C, F)), const((1, F)), const((F, O)),
                 const((1, O))]
    operands += (w1_taps, b1, w2, b2)

    return pl.pallas_call(
        functools.partial(_kernel, bh=bh, W=W, C=C, F=F, O=O,
                          n_bands=n_bands, has_m=has_m),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bh, W, O), lambda n, i: (n, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, O), a.dtype),
        scratch_shapes=[pltpu.VMEM((bh + 2, W + 2, C), a.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() == "cpu",
    )(*operands)


def _xla_tail(a, m, w1, b1, w2, b2):
    """Reference semantics (the current heads.py path), used for the
    backward pass and for correctness tests."""
    x = a + m if m is not None else a
    h = jax.lax.conv_general_dilated(
        x, w1, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1[0]
    h = jax.nn.relu(h)
    y = jnp.einsum("nhwf,fo->nhwo", h, w2) + b2[0]
    return y.astype(a.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_dpt_tail(a, m, w1, b1, w2, b2, bh: int = 8):
    """out = conv1x1(relu(conv3x3_SAME(a + m, w1) + b1), w2) + b2.

    a (N, H, W, C); m: same shape or None; w1: (3, 3, C, F); b1: (1, F)
    (pass zeros for a bias-free conv); w2: (F, O); b2: (1, O).
    H % bh == 0; C, F, O should be multiples of 128 (pad O in the caller).
    """
    return _pallas_tail(a, m, w1, b1, w2, b2, bh)


def _fwd(a, m, w1, b1, w2, b2, bh):
    return _pallas_tail(a, m, w1, b1, w2, b2, bh), (a, m, w1, b1, w2, b2)


def _bwd(bh, res, g):
    a, m, w1, b1, w2, b2 = res
    if m is None:
        _, vjp = jax.vjp(lambda a_, w1_, b1_, w2_, b2_: _xla_tail(
            a_, None, w1_, b1_, w2_, b2_), a, w1, b1, w2, b2)
        da, dw1, db1, dw2, db2 = vjp(g)
        return da, None, dw1, db1, dw2, db2
    _, vjp = jax.vjp(_xla_tail, a, m, w1, b1, w2, b2)
    return vjp(g)


fused_dpt_tail.defvjp(_fwd, _bwd)
