"""Recompute the holdout overfits' per-frame SSIM with the FIXED ssim().

The jobs 030/031 artifacts were produced with the pre-fix ssim() (SAME-
padding border windows → out-of-range per-frame values like 1.12 / -112 on
scene 6c995). The Gaussians are saved, so the recon renders are exactly
reproducible on CPU without the model forward; this re-renders all 8 frames
per scene through the SAME decoder path the overfit tool used
(decoder_forward + DecoderSplattingConfig, predicted poses saved in the
npz), sanity-checks PSNR against the committed values, and rewrites
per_frame_ssim (+ holdout_ssim) in metrics.json with the fixed metric.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/recompute_holdout_ssim.py
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
from vicasplat_tpu.loss.ssim import ssim
from vicasplat_tpu.models.adapter import Gaussians, build_covariance

for scene in ("6c99592614256138", "05b1462991e38e4d"):
    d = pathlib.Path(f"/root/repo/outputs/real_scene_overfit/{scene}_holdout")
    z = np.load(d / "gaussians_full.npz")
    # npz fields are saved with the overfit tool's layout: (T, N, ...) per
    # scene, rotations in xyzw (adapter convention), poses = the model's
    # PREDICTED camera extrinsics used for the committed recon render.
    means = jnp.asarray(z["means"])[None]
    scales = jnp.asarray(z["scales"])[None]
    rot = jnp.asarray(z["rotations"])[None]
    sh = jnp.asarray(z["harmonics"])[None]
    opac = jnp.asarray(z["opacities"])[None]
    g = Gaussians(
        means=means,
        covariances=build_covariance(scales, rot),
        harmonics=sh,
        opacities=opac,
        scales=scales,
        rotations=rot,
    )
    poses = jnp.asarray(z["extrinsics"])[None]       # (1, T, 4, 4)
    Kmat = jnp.asarray(z["intrinsics"])
    T = poses.shape[1]
    S = int(z["means"].shape[-2] ** 0.5) if z["means"].ndim == 3 else 128
    mp = json.loads((d / "metrics.json").read_text())
    S = int(mp["size"])
    gt = load_images(pathlib.Path("/root/reference/examples") / scene, S)

    dec_cfg = DecoderSplattingConfig()
    out = jax.jit(lambda gg, pp: decoder_forward(
        dec_cfg, gg, pp, jnp.broadcast_to(Kmat, (1, T, 3, 3)),
        jnp.full((1, T), 0.05), jnp.full((1, T), 100.0), (S, S)))(g, poses)
    recon = np.clip(np.asarray(out.color[0]), 0, 1)

    psnr = [float(-10 * np.log10(max(np.mean((recon[i] - gt[i]) ** 2), 1e-10)))
            for i in range(T)]
    drift = max(abs(a - b) for a, b in zip(psnr, mp["per_frame_psnr"]))
    ss = [float(ssim(jnp.asarray(recon[i]), jnp.asarray(gt[i])))
          for i in range(T)]
    print(f"{scene}: psnr drift vs committed {drift:.3f} dB")
    print("  old ssim:", mp["per_frame_ssim"])
    print("  new ssim:", [round(s, 4) for s in ss])
    # the committed recon was rendered on TPU (default-precision f32
    # einsums = bf16 passes in compositing); the CPU re-render is the more
    # exact one and drifts up to ~0.33 dB per frame — noise at SSIM scale
    assert drift < 0.5, "re-render does not reproduce the committed PSNR"
    assert all(-1.0 <= s <= 1.0 for s in ss)

    mp["per_frame_ssim"] = [round(s, 4) for s in ss]
    mp["ssim_note"] = ("per-frame SSIM recomputed with the border-cropped "
                       "ssim() (pre-fix values were out of range on "
                       "near-constant border windows)")
    hold = mp.get("holdout", {})
    if hold:
        hold["holdout_ssim"] = {str(h): round(ss[int(h)], 4)
                                for h in hold["holdout_frames"]}
    (d / "metrics.json").write_text(json.dumps(mp, indent=2))
    print(f"  rewrote {d}/metrics.json")
