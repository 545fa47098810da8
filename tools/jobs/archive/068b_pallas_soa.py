"""Pallas composite v3: SoA payload layout experiment.

The parked kernel (pallas_composite.py, 90-100 ms/view vs 0.79 XLA) holds
each tile's payload as a (K, 16) block — a 16-wide trailing dim that wastes
7/8 of the 128-lane registers on every field extraction (pc[:, i] is a
sublane-strided slice). This variant transposes to (16, K): fields are
ROWS, lanes run along the K splats, so every per-splat vector op is
full-lane. Measured head-to-head vs the XLA composite on the production
tile shape (256 tiles, K=512, P=256).
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from benchlib import device_time, sync

from vicasplat_tpu.ops.rasterize.tiles import TileBins, composite_tiles

_LOG_T_EPS = math.log(1e-4)


def _kernel_soa(payload_ref, out_ref, *, tile_px, chunk, n_chunks, tiles_x):
    """payload_ref: (16, K) — SoA rows, lanes along splats."""
    P = tile_px * tile_px
    G = chunk

    tile_id = pl.program_id(0)
    ty = tile_id // tiles_x
    tx = tile_id % tiles_x

    lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    oy = (lin // tile_px).astype(jnp.float32)
    ox = (lin % tile_px).astype(jnp.float32)
    px = (tx * tile_px).astype(jnp.float32) + ox + 0.5
    py = (ty * tile_px).astype(jnp.float32) + oy + 0.5

    gi = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    tri = (gi < gj).astype(jnp.float32)

    def chunk_math(j, log_t, rgbd):
        sl = pl.ds(j * G, G)
        mx = payload_ref[0:1, sl]   # (1, G) full-lane rows
        my = payload_ref[1:2, sl]
        ca = payload_ref[2:3, sl]
        cb = payload_ref[3:4, sl]
        cc = payload_ref[4:5, sl]
        alp = payload_ref[5:6, sl]
        feats = payload_ref[6:10, sl]  # (4, G)

        dx = px - mx  # (P, G)
        dy = py - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        a = jnp.minimum(0.99, alp * jnp.exp(jnp.minimum(power, 0.0)))
        a = jnp.where((power > 0.0) | (a < 1.0 / 255.0), 0.0, a)

        logom = jnp.log1p(-a)
        prefix = jnp.dot(logom, tri, preferred_element_type=jnp.float32)
        w = jnp.exp(log_t + prefix) * a
        rgbd = rgbd + jax.lax.dot_general(
            w, feats, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, 4)
        return log_t + jnp.sum(logom, axis=1, keepdims=True), rgbd

    def body(j, carry):
        log_t, rgbd = carry
        alive = jnp.max(log_t) > _LOG_T_EPS
        return jax.lax.cond(
            alive, lambda args: chunk_math(j, *args), lambda args: args,
            (log_t, rgbd),
        )

    init = (jnp.zeros((P, 1), jnp.float32), jnp.zeros((P, 4), jnp.float32))
    if n_chunks == 1:
        log_t, rgbd = chunk_math(0, *init)
    else:
        log_t, rgbd = jax.lax.fori_loop(0, n_chunks, body, init)

    out_ref[...] = jnp.concatenate(
        [rgbd, jnp.exp(log_t), jnp.zeros((P, 3), jnp.float32)], axis=1
    )


def composite_soa(payload_soa, tile_px, chunk, tiles_x, num_tiles, K):
    P = tile_px * tile_px
    kernel = functools.partial(_kernel_soa, tile_px=tile_px, chunk=chunk,
                               n_chunks=K // chunk, tiles_x=tiles_x)
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec((16, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((P, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles * P, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_tiles * P * K * chunk // 4,
            bytes_accessed=num_tiles * K * 16 * 4 + num_tiles * P * 8 * 4,
            transcendentals=num_tiles * P * K,
        ),
    )(payload_soa.reshape(num_tiles * 16, K))
    return out.reshape(num_tiles, P, 8)


# ---- realistic payload: use the production binning on flagship splats ----
from vicasplat_tpu.models import (
    GaussianAdapterConfig, VicaNetConfig, VicaSplatConfig,
    init_vicasplat, vicasplat_forward,
)
from vicasplat_tpu.ops.rasterize.projection import project_gaussians, cov6_from_scale_rot
from vicasplat_tpu.ops.rasterize.tiles import bin_splats

cfg = VicaSplatConfig(backbone=VicaNetConfig(),
                      gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
B, T, size = 1, 8, 256
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vicasplat(jax.random.PRNGKey(0), cfg))
Kin = jnp.broadcast_to(
    jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (B, T, 3, 3))
imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, size, size, 3)) * 2 - 1
out = jax.jit(lambda im, p: vicasplat_forward(
    p, cfg, {"image": im, "intrinsics": Kin}, dtype=jnp.bfloat16))(imgs, params)
g = out["gaussians"]
N = B * T * size * size
means = g.means.reshape(N, 3).astype(jnp.float32)
scales = g.scales.reshape(N, 3).astype(jnp.float32)
rots = g.rotations.reshape(N, 4).astype(jnp.float32)
sh = g.harmonics.reshape(N, 3, -1).astype(jnp.float32)
opac = g.opacities.reshape(N).astype(jnp.float32)
cov6 = jax.jit(cov6_from_scale_rot)(scales, rots)
cov = jnp.zeros((N, 3, 3))
viewmat = jnp.eye(4)
Kmat = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
H = W = size
splats = jax.jit(lambda m: project_gaussians(m, cov, sh, opac, viewmat, Kmat,
                                             (H, W), 4, cov6=cov6))(means)
bins = jax.jit(lambda s: bin_splats(s, (H, W), 16, (2, 2), 512))(splats)
sync(bins.payload[0, 0])
num_tiles, K, C = bins.payload.shape
tiles_x = 16
print(f"payload: {bins.payload.shape}")

t_xla = device_time(
    lambda p: composite_tiles(TileBins(payload=p), (H, W), 16,
                              jnp.zeros(3), chunk=256, tile_group=64),
    bins.payload, iters=20, repeats=2)
print(f"XLA composite:        {t_xla*1e3:7.3f} ms")

payload_soa = jnp.swapaxes(bins.payload, 1, 2)  # (num_tiles, 16, K)

for chunk in (512, 256, 128):
    try:
        t = device_time(
            lambda p: composite_soa(p, 16, chunk, tiles_x, num_tiles, K),
            payload_soa, iters=20, repeats=2)
        print(f"SoA pallas chunk={chunk:4d}: {t*1e3:7.3f} ms")
    except Exception as e:
        print(f"SoA pallas chunk={chunk:4d}: FAILED {type(e).__name__}: {str(e)[:300]}")

# transpose cost if we keep the binning output AoS
t_tr = device_time(lambda p: jnp.swapaxes(p, 1, 2) + 0.0, bins.payload,
                   iters=20, repeats=2)
print(f"AoS->SoA transpose:   {t_tr*1e3:7.3f} ms")

# numeric check vs XLA composite
ref_rgb, ref_dep, ref_alp = jax.jit(
    lambda p: composite_tiles(TileBins(payload=p), (H, W), 16, jnp.zeros(3),
                              chunk=256, tile_group=64))(bins.payload)
raw = jax.jit(lambda p: composite_soa(p, 16, 256, tiles_x, num_tiles, K))(payload_soa)
raw = np.asarray(raw)


def stitch(x, c):
    x = x.reshape(16, 16, 16, 16, *c)
    x = np.moveaxis(x, 2, 1).reshape(256, 256, *c)
    return x

rgb = stitch(raw[..., :3], (3,))
dep = stitch(raw[..., 3], ())
tfin = stitch(raw[..., 4], ())
print("max|rgb diff|:", float(np.abs(rgb - np.asarray(ref_rgb)).max()))
print("max|dep diff|:", float(np.abs(dep - np.asarray(ref_dep)).max()))
print("max|alpha diff|:", float(np.abs((1 - tfin) - np.asarray(ref_alp)).max()))
