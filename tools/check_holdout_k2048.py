"""Do the rasterizer caps hurt the committed holdout-overfit metrics?

Job 033b: on the trained scene-1 Gaussians (131k splats @ 128^2) the
default K=512 render is 20.5 dB from the unbounded oracle and the adaptive
selector picks K=2048. The committed metrics rendered at the default —
this re-renders both scenes' 8 frames at K=2048 / dup 3 and reports the
per-frame PSNR-vs-GT delta. If positive, the caps were suppressing real
model quality and the decoder default for dense scenes should change.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/check_holdout_k2048.py
"""
import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from demo import load_images
from vicasplat_tpu.decoder.splatting import DecoderSplattingConfig, decoder_forward
from vicasplat_tpu.models.adapter import Gaussians, build_covariance
from vicasplat_tpu.ops.rasterize.render import RasterizeConfig

for scene in ("6c99592614256138", "05b1462991e38e4d"):
    d = pathlib.Path(f"/root/repo/outputs/real_scene_overfit/{scene}_holdout")
    z = np.load(d / "gaussians_full.npz")
    g = Gaussians(
        means=jnp.asarray(z["means"])[None],
        covariances=build_covariance(
            jnp.asarray(z["scales"])[None], jnp.asarray(z["rotations"])[None]),
        harmonics=jnp.asarray(z["harmonics"])[None],
        opacities=jnp.asarray(z["opacities"])[None],
        scales=jnp.asarray(z["scales"])[None],
        rotations=jnp.asarray(z["rotations"])[None],
    )
    poses = jnp.asarray(z["extrinsics"])[None]
    Kmat = jnp.asarray(z["intrinsics"])
    T = poses.shape[1]
    mp = json.loads((d / "metrics.json").read_text())
    S = int(mp["size"])
    gt = load_images(pathlib.Path("/root/reference/examples") / scene, S)

    def render_with(cfg_r):
        dec = DecoderSplattingConfig(rasterize=cfg_r)
        out = jax.jit(lambda gg, pp: decoder_forward(
            dec, gg, pp, jnp.broadcast_to(Kmat, (1, T, 3, 3)),
            jnp.full((1, T), 0.05), jnp.full((1, T), 100.0), (S, S)))(g, poses)
        return np.clip(np.asarray(out.color[0]), 0, 1)

    def psnrs(recon):
        return [float(-10 * np.log10(max(np.mean((recon[i] - gt[i]) ** 2),
                                         1e-10))) for i in range(T)]

    base = psnrs(render_with(RasterizeConfig()))
    big = psnrs(render_with(RasterizeConfig(dup_hw=(3, 3), max_per_tile=2048)))
    hold = mp["holdout"]["holdout_frames"]
    print(f"{scene} (holdout frames {hold}):")
    print("  K=512 (committed):", [round(p, 2) for p in base])
    print("  K=2048 dup3:      ", [round(p, 2) for p in big])
    print("  delta:            ", [round(b - a, 2) for a, b in zip(base, big)])
    print("  holdout delta:    ",
          {h: round(big[int(h)] - base[int(h)], 2) for h in hold})
