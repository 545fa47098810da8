"""AOT model export: serialize the serving programs to portable StableHLO
artifacts (jax.export) that run without the model's Python code.

Production TPU deployment pattern: trace + lower once at release time and
ship the serialized artifact; the serving host deserializes and calls it
with a params pytree. Weights stay call-time ARGUMENTS (never baked into
the module as constants — the round-2/3 lesson that constant-embedded
param trees balloon compile requests), so one artifact serves any
checkpoint of the same architecture.

The exported calling convention uses only standard pytrees (nested dicts
of arrays): `Gaussians` is flattened to a dict at the boundary, so
deserializing needs nothing registered. `load_exported(...).call(params,
images01)` works from a process that never imports the model code.

The torch reference has no AOT story (it ships the python model, reference
demo.py:304-359); this is the TPU-native equivalent of a SavedModel.
"""
from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp


def _gaussians_to_dict(g):
    return dict(g._asdict())


def export_reconstruct(engine, batch: int, frames: int, height: int,
                       width: int, with_intrinsics: bool = False,
                       platforms=None) -> bytes:
    """Serialize the engine's reconstruct program for a fixed input shape.

    Returns bytes; the artifact's call convention is
    `(params, images01[, intrinsics]) -> {"gaussians": {...}, "poses": ...,
    "intrinsics": ...}` with images01 float32 (B, T, H, W, 3) in [0, 1].

    `platforms` (e.g. ("tpu", "cpu")) enables cross-platform lowering —
    export on a CPU release host, serve on TPU. Leave None to lower for the
    current backend only (required if the traced path contains
    backend-specific Pallas kernels).
    """
    from jax import export as jexport

    raw = engine._reconstruct_raw()

    def fn(params, images01, intrinsics=None):
        g, poses, intr = raw(params, images01, intrinsics)
        out = {"gaussians": _gaussians_to_dict(g), "poses": poses}
        if intr is not None:
            out["intrinsics"] = intr
        return out

    img = jax.ShapeDtypeStruct((batch, frames, height, width, 3), jnp.float32)
    args = [engine.params, img]
    if with_intrinsics:
        args.append(jax.ShapeDtypeStruct((batch, frames, 3, 3), jnp.float32))
        wrapped = lambda p, im, K: fn(p, im, K)
    else:
        wrapped = lambda p, im: fn(p, im, None)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), args)
    kw = {} if platforms is None else {"platforms": tuple(platforms)}
    exported = jexport.export(jax.jit(wrapped), **kw)(*abstract)
    return exported.serialize()


def export_render(engine, scene_dims, n_views: int, image_shape,
                  platforms=None) -> bytes:
    """Serialize the engine's render program.

    `scene_dims` are the Gaussian leading dims (e.g. (B, T, H, W) for
    pixel-aligned scenes). Call convention:
    `(gaussians_dict, extrinsics, intrinsics, near, far) ->
    {"color", "depth", "alpha"}`.
    """
    from jax import export as jexport

    from .models.adapter import Gaussians

    d_sh = engine.cfg.gaussian_adapter.d_sh
    sd = tuple(scene_dims)
    f32 = jnp.float32
    g_abs = {
        "means": jax.ShapeDtypeStruct(sd + (3,), f32),
        "covariances": jax.ShapeDtypeStruct(sd + (3, 3), f32),
        "harmonics": jax.ShapeDtypeStruct(sd + (3, d_sh), f32),
        "opacities": jax.ShapeDtypeStruct(sd, f32),
        "scales": jax.ShapeDtypeStruct(sd + (3,), f32),
        "rotations": jax.ShapeDtypeStruct(sd + (4,), f32),
    }
    B, V = sd[0], n_views

    raw = engine._render_raw(tuple(image_shape))

    def fn(g_dict, extrinsics, intrinsics, near, far):
        g = Gaussians(**g_dict)
        out = raw(None, g, extrinsics, intrinsics, near, far)
        return dict(out._asdict())

    abstract = (
        g_abs,
        jax.ShapeDtypeStruct((B, V, 4, 4), f32),
        jax.ShapeDtypeStruct((B, V, 3, 3), f32),
        jax.ShapeDtypeStruct((B, V), f32),
        jax.ShapeDtypeStruct((B, V), f32),
    )
    kw = {} if platforms is None else {"platforms": tuple(platforms)}
    exported = jexport.export(jax.jit(fn), **kw)(*abstract)
    return exported.serialize()


def save_exported(path, blob: bytes):
    pathlib.Path(path).write_bytes(blob)


def load_exported(path):
    """Deserialize an artifact; returns a jax.export.Exported — invoke with
    `.call(*args)` (re-jit with `jax.jit(exp.call)` for repeated use)."""
    from jax import export as jexport

    return jexport.deserialize(pathlib.Path(path).read_bytes())


def main(argv=None):
    """`python -m vicasplat_tpu.export --out model.shlo --batch 1 --frames 8
    [--ckpt ...] [--quantize]` — release-time artifact build."""
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--no-intrinsics", action="store_true",
                    help="export the predicted-intrinsics calling convention")
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--platforms", nargs="*", default=None,
                    help='cross-platform lowering targets, e.g. tpu cpu')
    args = ap.parse_args(argv)

    from .models import (
        GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig,
    )
    from .serving import InferenceEngine

    cfg = VicaSplatConfig(backbone=VicaNetConfig(img_size=args.size),
                          gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
    engine = InferenceEngine(cfg, ckpt=args.ckpt, quantize=args.quantize)
    blob = export_reconstruct(
        engine, args.batch, args.frames, args.size, args.size,
        with_intrinsics=not args.no_intrinsics, platforms=args.platforms)
    save_exported(args.out, blob)
    print(f"wrote {args.out} ({len(blob)} bytes, "
          f"{args.batch}x{args.frames}x{args.size}^2"
          f"{', int8' if args.quantize else ''})")


if __name__ == "__main__":
    main()
