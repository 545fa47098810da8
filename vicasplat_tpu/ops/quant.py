"""Int8 weight + dynamic activation quantization (W8A8) for serving.

TPU-native rationale: the v5e MXU runs int8 matmuls at 2x the bf16 peak
(394 vs 197 TOPS), and int8-resident weights halve weight HBM traffic
versus bf16. Quantization is symmetric: weights per-output-channel at
prepare time, activations per-token at run time (dynamic, no calibration
data needed). The int32 accumulator is rescaled by the product of the two
scales, so `linear()` consumers see float outputs of the usual dtype.

Opt-in and experimental: accuracy on a given checkpoint must be validated
(serving.InferenceEngine(quantize=True) + the relative-error test in
tests/test_quant.py). The torch reference has no quantized path; this is
a beyond-reference serving optimization.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_linear(p: dict) -> dict:
    """{"w" (..., d_in, d_out), "b"?} -> {"w_q" int8, "w_s" f32 (..., d_out),
    "b"?}.

    Per-output-channel symmetric over the contraction (second-to-last) dim:
    column j stored as round(w[..., :, j] / s_j), s_j = max|w[..., :, j]|/127.
    Leading dims (e.g. the stacked-blocks L axis that lax.scan slices per
    layer) pass through, so scanned block params quantize like flat ones.
    """
    w = jnp.asarray(p["w"], jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=-2) / 127.0, 1e-8)
    w_q = jnp.clip(jnp.round(w / s[..., None, :]), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "w_s": s}
    if "b" in p:
        out["b"] = p["b"]
    return out


def linear_w8a8(p: dict, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Quantized drop-in for layers.linear on a quantize_linear'd param dict.

    Dynamic per-token activation quant -> int8 x int8 matmul with an int32
    accumulator (MXU-native) -> rescale by (token scale) x (channel scale).
    """
    out_dtype = dtype or (x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                          else jnp.float32)
    xf = jnp.asarray(x, jnp.float32)
    ax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                     1e-8)
    x_q = jnp.clip(jnp.round(xf / ax), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, p["w_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * ax * p["w_s"]
    if "b" in p:
        y = y + jnp.asarray(p["b"], jnp.float32)
    return y.astype(out_dtype)


# Measured-sensitive families kept float by default (job 043,
# outputs/int8_trained/sensitivity.json): /center_head/proj alone is
# -2.01 dB render PSNR on the trained scene-1 checkpoint — its pts3d
# output passes through expm1, which exponentiates quant noise into
# position error. All other 18 families together: -0.16 dB.
SENSITIVE_PATHS = ("/center_head/",)


def quantize_tree(params, min_size: int = 1 << 14, exclude: tuple = (),
                  include_only: tuple = ()):
    """Quantize every linear-shaped {"w"} dict in a params pytree whose
    per-layer kernel (product of the last two dims) has at least `min_size`
    elements (small layers — heads, embeds of tiny models — stay float:
    their matmuls are latency-, not FLOP-bound, and they contribute most of
    the quantization error budget).

    Eligible kernels are 2-D (d_in, d_out) flat linears or 3-D
    (L, d_in, d_out) stacked-block linears (the lax.scan slices them to 2-D
    per layer — these ARE the model's dominant matmuls). 4-D conv kernels
    (patch embed, DPT heads) are consumed by conv code that reads "w"
    directly and stay untouched.

    `exclude`: path substrings (e.g. "camera_head") whose families stay
    float — selective quantization recovers most of the task-space error
    of sensitive layers at a small memory cost. `include_only`: if
    non-empty, quantize ONLY families whose path matches (sensitivity
    studies). Paths are "/"-joined dict keys.

    Returns (new_params, n_quantized).
    """
    n = 0

    def walk(node, path=""):
        nonlocal n
        if isinstance(node, dict):
            w = node.get("w")
            if (w is not None and getattr(w, "ndim", 0) in (2, 3)
                    and w.shape[-1] * w.shape[-2] >= min_size
                    and set(node) <= {"w", "b"}):
                if any(e in path for e in exclude):
                    return node
                if include_only and not any(e in path for e in include_only):
                    return node
                n += 1
                return quantize_linear(node)
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(
                walk(v, f"{path}/{i}") for i, v in enumerate(node))
        return node

    return walk(params), n


def quantizable_paths(params, min_size: int = 1 << 14) -> list:
    """Paths of the families quantize_tree would touch (study/reporting)."""
    out = []

    def walk(node, path=""):
        if isinstance(node, dict):
            w = node.get("w")
            if (w is not None and getattr(w, "ndim", 0) in (2, 3)
                    and w.shape[-1] * w.shape[-2] >= min_size
                    and set(node) <= {"w", "b"}):
                out.append(path)
                return
            for k, v in node.items():
                walk(v, f"{path}/{k}")
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{path}/{i}")

    walk(params)
    return out


def cast_tree_preserving_quant(params, dtype):
    """Cast float leaves to `dtype`, except inside quantized linears: w_q
    stays int8 and w_s stays f32 (the dequant rescale is the accuracy-
    critical multiply; bf16 scales would add ~0.4% relative error)."""
    def walk(node):
        if isinstance(node, dict):
            if "w_q" in node:
                out = dict(node)
                if "b" in out:
                    out["b"] = jnp.asarray(out["b"], dtype)
                return out
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return jnp.asarray(node, dtype)

    return walk(params)
