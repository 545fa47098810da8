"""tile_px=8 geometry: 4x fewer pixels/tile -> smaller K, cheaper composite.
Risk: dup (2,2) at 8px tiles truncates coverage of radius>8px splats."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from benchlib import device_time, sync

from vicasplat_tpu.ops.rasterize.render import render, RasterizeConfig

N = 524288
H = W = 256
V = 12
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
means = jax.random.normal(ks[0], (N, 3)) * jnp.array([0.6, 0.6, 0.3]) + jnp.array([0.0, 0.0, 2.0])
scales = jnp.exp(jax.random.normal(ks[1], (N, 3)) * 0.3) * 0.004  # small splats
quat = jax.random.normal(ks[2], (N, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
w, x, y, z = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
R = jnp.stack([
    1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
    2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
    2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
], axis=-1).reshape(-1, 3, 3)
cov = jnp.einsum("nij,nj,nkj->nik", R, scales**2, R)
sh = jax.random.normal(ks[3], (N, 3, 25)) * 0.2
opac = jax.nn.sigmoid(jax.random.normal(ks[4], (N,)))
bg = jnp.zeros(3)
ext = jnp.broadcast_to(jnp.eye(4), (V, 4, 4))
ext = ext.at[:, 2, 3].set(jnp.linspace(0.0, 0.5, V))
Kmat = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
Ks = jnp.broadcast_to(Kmat, (V, 3, 3))

cfgs = {
    "t16 K512 c256 (default)": RasterizeConfig(),
    "t8 K256 c128 tg256": RasterizeConfig(tile_px=8, max_per_tile=256,
                                          chunk=128, tile_group=256),
    "t8 K128 c128 tg256": RasterizeConfig(tile_px=8, max_per_tile=128,
                                          chunk=128, tile_group=256),
}
outs = {}
for tag, c in cfgs.items():
    f = jax.jit(lambda e, k2, c=c: render(means, cov, sh, opac, e, k2, (H, W), bg, 4, cfg=c))
    outs[tag] = f(ext, Ks)
    sync(outs[tag][0][..., :1])
    t = device_time(lambda m, c=c: render(m, cov, sh, opac, ext, Ks, (H, W), bg, 4, cfg=c),
                    means, iters=8, base=2, repeats=2)
    print(f"render 12v [{tag}]: {t*1e3:.1f} ms")

ref = outs["t16 K512 c256 (default)"][0]
for tag in list(cfgs)[1:]:
    c = outs[tag][0]
    mse = float(jnp.mean((c - ref) ** 2))
    import math
    psnr = -10 * math.log10(mse) if mse > 0 else float("inf")
    print(f"{tag}: vs t16 PSNR {psnr:.1f} dB, max|dC| {float(jnp.abs(c-ref).max()):.4f}")
