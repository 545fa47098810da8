"""Structure of the held-out translation-DIRECTION errors (round 5; judge
r4 next #2: rotation is solved at ~3 deg but translation direction stalls
at ~40 deg — before iterating on losses, characterize HOW it fails).

Questions this answers, per held-out scene pair (frame 0 -> frame i,
reference protocol metrics.camera_eval_metrics):
  1. COLLAPSE: are predicted directions all pointing one way (mean
     pairwise |cos| among pred dirs >> among GT dirs)?
  2. SCALE: does direction error correlate with |t_gt| (small baselines
     are ill-conditioned for direction)?
  3. BIAS: is there a systematic mean offset (e.g. always "forward")?
  4. IN-SCENE CONSISTENCY: within one scene, are the three pair
     directions coherently wrong (a per-scene gauge error) or
     independently wrong (no signal)?

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
       python tools/diag_trans_dir.py
"""
import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np


def main(argv=None):
    import argparse

    import jax
    import jax.numpy as jnp

    import pose_segments
    from vicasplat_tpu.data import DataModule
    from vicasplat_tpu.models import init_vicasplat
    from vicasplat_tpu.models.vicasplat import vicasplat_forward
    from vicasplat_tpu.utils.config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default="",
                    help="orbax ckpt dir (e.g. the v7 ckpts_v7_dir); "
                         "default = newest v6 segment ckpt")
    ap.add_argument("--out_name", default="diag_trans_dir.json")
    args = ap.parse_args(argv)

    cfg = load_config(
        "/root/repo/configs/main.yaml", experiment="synthetic_pose",
        overrides=[f"dataset.synthetic.n_scenes={pose_segments.N_SCENES}"])
    pose_segments.bootstrap_from_committed(cfg)
    if args.ckpt_dir:
        from vicasplat_tpu.utils.checkpointing import CheckpointManager

        ckpt = CheckpointManager(args.ckpt_dir, keep=5).latest()
    else:
        ckpt = pose_segments.newest_ckpt(pose_segments.N_SEGMENTS + 1)
    print("ckpt:", ckpt)
    from vicasplat_tpu.utils.checkpointing import load_weights

    params = load_weights(str(ckpt), template=init_vicasplat(
        jax.random.PRNGKey(0), cfg.encoder))

    enc = jax.jit(lambda p, c: vicasplat_forward(
        p, cfg.encoder, dict(c, image=c["image"] * 2 - 1),
        dtype=jnp.float32))

    dm = DataModule(cfg.dataset, cfg.data_loader, None)
    loader = dm.test_dataloader()
    rows = []
    for i, batch in enumerate(loader):
        ctx = batch["context"]
        out = enc(params, ctx)
        pred = np.asarray(out["gaussian_camera_extrins"][0], np.float64)
        gt = np.asarray(ctx["extrinsics"][0], np.float64)
        rel_gt = np.linalg.inv(gt[:1]) @ gt[1:]
        rel_pr = np.linalg.inv(pred[:1]) @ pred[1:]
        for j in range(rel_gt.shape[0]):
            tg, tp = rel_gt[j, :3, 3], rel_pr[j, :3, 3]
            ng, np_ = np.linalg.norm(tg), np.linalg.norm(tp)
            dg = tg / max(ng, 1e-12)
            dp = tp / max(np_, 1e-12)
            err = float(np.degrees(np.arccos(
                np.clip(dg @ dp, -1.0, 1.0))))
            rows.append({"scene": i, "pair": j, "gt_mag": float(ng),
                         "pred_mag": float(np_), "err_deg": err,
                         "dg": dg.tolist(), "dp": dp.tolist()})
    loader.close()

    err = np.array([r["err_deg"] for r in rows])
    mag = np.array([r["gt_mag"] for r in rows])
    pmag = np.array([r["pred_mag"] for r in rows])
    DG = np.array([r["dg"] for r in rows])
    DP = np.array([r["dp"] for r in rows])
    print(f"\npairs: {len(rows)}  err mean {err.mean():.1f} median "
          f"{np.median(err):.1f}  frac<30 {(err < 30).mean():.3f}")

    def mean_abs_cos(D):
        C = np.abs(D @ D.T)
        iu = np.triu_indices(len(D), 1)
        return float(C[iu].mean())

    print(f"collapse: mean |cos| pred dirs {mean_abs_cos(DP):.3f} vs GT "
          f"{mean_abs_cos(DG):.3f}  (1.0 = all parallel)")
    print(f"mean pred dir {DP.mean(0).round(3).tolist()} |.|="
          f"{np.linalg.norm(DP.mean(0)):.3f}; mean GT dir "
          f"{DG.mean(0).round(3).tolist()} |.|="
          f"{np.linalg.norm(DG.mean(0)):.3f}")
    if len(err) > 2:
        c = np.corrcoef(mag, err)[0, 1]
        print(f"corr(|t_gt|, err) = {c:.3f}; "
              f"median err at |t| below/above median: "
              f"{np.median(err[mag < np.median(mag)]):.1f} / "
              f"{np.median(err[mag >= np.median(mag)]):.1f}")
    print(f"pred magnitude vs gt: ratio mean "
          f"{np.mean(pmag / np.maximum(mag, 1e-9)):.3f}")

    # in-scene coherence: best-fit single rotation aligning pred dirs to
    # GT dirs per scene; residual after alignment tells gauge-vs-noise
    print("\nper-scene: raw median err | err after best single rotation")
    for s in sorted({r["scene"] for r in rows}):
        ii = [k for k, r in enumerate(rows) if r["scene"] == s]
        A, B = DP[ii], DG[ii]
        # Kabsch on unit dirs
        H = A.T @ B
        U, _, Vt = np.linalg.svd(H)
        d = np.sign(np.linalg.det(Vt.T @ U.T))
        R = Vt.T @ np.diag([1, 1, d]) @ U.T
        A2 = (R @ A.T).T
        e_raw = np.median(err[ii])
        e_al = np.median(np.degrees(np.arccos(np.clip(
            (A2 * B).sum(-1), -1, 1))))
        print(f"  scene {s}: {e_raw:6.1f} | {e_al:6.1f}")

    # gauge ceiling: pose_auc of max(rot ~3deg, trans err) with each
    # scene's single best-fit rotation applied — the upper bound on what
    # fixing ONLY the per-scene gauge rotation buys
    err_cor = np.zeros_like(err)
    for s in sorted({r["scene"] for r in rows}):
        ii = [k for k, r in enumerate(rows) if r["scene"] == s]
        A, B = DP[ii], DG[ii]
        U, _, Vt = np.linalg.svd(A.T @ B)
        sgn = np.sign(np.linalg.det(Vt.T @ U.T))
        R = Vt.T @ np.diag([1, 1, sgn]) @ U.T
        err_cor[ii] = np.degrees(np.arccos(np.clip(
            (((R @ A.T).T) * B).sum(-1), -1, 1)))
    from vicasplat_tpu.evaluation.metrics import pose_auc

    rot3 = np.full_like(err, 3.0)
    auc_raw = pose_auc(np.maximum(rot3, err), (5, 10, 20, 30))
    auc_cor = pose_auc(np.maximum(rot3, err_cor), (5, 10, 20, 30))
    gauge = {
        "note": "pose_auc of max(rot~3deg, trans_err), raw vs per-scene "
                "Kabsch-corrected directions",
        "raw": dict(zip(["auc@5", "auc@10", "auc@20", "auc@30"],
                        [round(a, 4) for a in auc_raw])),
        "gauge_corrected": dict(zip(["auc@5", "auc@10", "auc@20", "auc@30"],
                                    [round(a, 4) for a in auc_cor])),
    }
    print("gauge ceiling:", gauge["raw"]["auc@30"], "->",
          gauge["gauge_corrected"]["auc@30"])

    out = pathlib.Path("/root/repo/outputs/tpu_pose_proof/v2_synthetic"
                       ) / args.out_name
    out.write_text(json.dumps({
        "gauge_ceiling": gauge,
        "ckpt": str(ckpt), "n_pairs": len(rows),
        "err_mean": float(err.mean()), "err_median": float(np.median(err)),
        "frac_lt30": float((err < 30).mean()),
        "collapse_abs_cos_pred": mean_abs_cos(DP),
        "collapse_abs_cos_gt": mean_abs_cos(DG),
        "mean_pred_dir": DP.mean(0).tolist(),
        "mean_gt_dir": DG.mean(0).tolist(),
        "corr_mag_err": float(np.corrcoef(mag, err)[0, 1]),
        "pred_over_gt_mag": float(np.mean(pmag / np.maximum(mag, 1e-9))),
        "rows": rows,
    }, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
