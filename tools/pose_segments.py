"""Segmented pose-generalization retrain, v6 (round 4→5 handoff).

v5 (jobs 051a-d) completed its planned 48k steps and produced the committed
held-out auc@30 trajectory 0.227 → 0.234 → 0.251 → 0.258 (12k→48k,
~+0.015/12k and still climbing) — but its checkpoints lived only in the
workspace and the 08-20 VM recreation destroyed them (the SECOND time a
wipe has eaten this run's weights). v6 re-runs the identical recipe with
the one fix that matters: **every segment ends by committing a float16
weights snapshot to git** (~60 MB, outputs/synthetic_pose/ckpt_committed/),
so any future session on any future VM can warm-start from the last
completed segment instead of burning 48k steps re-deriving a number we
already have.

Mechanics (unchanged from v5 otherwise):
- 12k-step segments, fresh AdamW + cosine per segment (SGDR warm restarts);
- warm-start from the newest orbax ckpt across v6 segment dirs, else
  bootstrap from the committed npz (reconstructed into an orbax dir so the
  normal ``checkpointing.load`` path is exercised);
- each segment ends with the full held-out pose eval (8 unseen scenes,
  reference protocol src/evaluation/pose_evaluator.py:34-245) appended to
  outputs/tpu_pose_proof/v2_synthetic/summary.json and committed.
"""
import json
import pathlib
import re
import subprocess

import numpy as np

ROOT = pathlib.Path("/root/repo")
CKPT_ROOT = ROOT / "outputs/synthetic_pose"
SUMMARY = ROOT / "outputs/tpu_pose_proof/v2_synthetic/summary.json"
COMMIT_NPZ = CKPT_ROOT / "ckpt_committed/weights_latest.npz"
N_SCENES = 4096
SEG_STEPS = 12000
N_SEGMENTS = 6
VERSION = "v6"


def _seg_dir(seg: int) -> pathlib.Path:
    return CKPT_ROOT / f"ckpts_{VERSION}_seg{seg}"


def save_committed(params, total_steps: int, seg: int) -> None:
    """Flatten params in template order and write a float16 npz.

    f16 keeps 10 mantissa bits (vs bf16's 7); trained weights of this 33M
    model sit well inside f16's range, and every segment restart is an SGDR
    warm restart (fresh optimizer) anyway, so the rounding is immaterial.
    """
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    payload = {f"arr_{i}": np.asarray(x).astype(np.float16)
               for i, x in enumerate(leaves)}
    payload["_total_steps"] = np.asarray(total_steps)
    payload["_segment"] = np.asarray(seg)
    COMMIT_NPZ.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(COMMIT_NPZ, **payload)
    print(f"committed-snapshot npz written: {COMMIT_NPZ} "
          f"({COMMIT_NPZ.stat().st_size/1e6:.1f} MB)", flush=True)


def load_committed(template):
    """Restore (params, total_steps, segment) from the committed npz."""
    import jax

    with np.load(COMMIT_NPZ) as z:
        leaves, treedef = jax.tree_util.tree_flatten(template)
        n = sum(1 for k in z.files if k.startswith("arr_"))
        if n != len(leaves):
            raise ValueError(
                f"committed npz has {n} leaves, template has {len(leaves)} "
                "(config drift since the snapshot was written)")
        restored = [np.asarray(z[f"arr_{i}"]).astype(np.asarray(t).dtype)
                    for i, t in enumerate(leaves)]
        total = int(z["_total_steps"])
        seg = int(z["_segment"])
    return jax.tree_util.tree_unflatten(treedef, restored), total, seg


def git_commit_segment(seg: int, total_k: int, auc30: float) -> None:
    """Persist the snapshot + metrics so a VM wipe cannot eat this segment."""
    try:
        subprocess.run(
            ["git", "add", "-f", str(COMMIT_NPZ), str(SUMMARY)],
            cwd=ROOT, check=True, capture_output=True)
        r = subprocess.run(
            ["git", "commit", "-m",
             f"Pose retrain v6 segment {seg}: auc@30 {auc30:.3f} at "
             f"{total_k}k steps (f16 weights snapshot committed)"],
            cwd=ROOT, check=False, capture_output=True, text=True)
        print("git commit:", (r.stdout or r.stderr).strip()[:200], flush=True)
    except Exception as e:  # never fail the job on git trouble
        print("git commit failed (continuing):", e, flush=True)


def newest_ckpt(upto_seg: int):
    """Newest checkpoint across v6 segment dirs 0..upto_seg by (seg, step)."""
    from vicasplat_tpu.utils.checkpointing import CheckpointManager

    best = None
    for seg in range(upto_seg + 1):
        d = _seg_dir(seg)
        if not d.exists():
            continue
        latest = CheckpointManager(str(d), keep=5).latest()
        if latest is None:
            continue
        m = re.search(r"(\d+)", pathlib.Path(latest).name)
        step = int(m.group(1)) if m else 0
        key = (seg, step)
        if best is None or key > best[0]:
            best = (key, latest)
    return None if best is None else str(best[1])


def bootstrap_from_committed(cfg) -> None:
    """Post-wipe recovery: rebuild an orbax ckpt dir from the committed npz
    so the normal warm-start path (checkpointing.load=<orbax dir>) works."""
    import jax

    from vicasplat_tpu.models import init_vicasplat
    from vicasplat_tpu.utils.checkpointing import CheckpointManager

    if not COMMIT_NPZ.exists():
        return
    with np.load(COMMIT_NPZ) as z:
        npz_seg = int(z["_segment"])
    # extension segments (seg >= N_SEGMENTS) must count as existing too
    if any(_seg_dir(s).exists()
           for s in range(max(N_SEGMENTS, npz_seg + 1))):
        return
    template = init_vicasplat(jax.random.PRNGKey(0), cfg.encoder)
    params, total, seg = load_committed(template)
    mgr = CheckpointManager(str(_seg_dir(seg)), keep=5, async_save=False)
    mgr.save(total - seg * SEG_STEPS, params)
    mgr.finalize()
    print(f"bootstrapped orbax ckpt from committed npz: segment {seg}, "
          f"{total} total steps", flush=True)


def _check_warm_start(seg: int, warm) -> None:
    """Refuse a cross-segment warm start from an INCOMPLETE predecessor.

    If segment k dies mid-training (tunnel hang/kill) its job is marked
    done by the worker (error status still writes <job>.out), and segment
    k+1 would warm-start from whatever newest_ckpt returns — a partial
    ckpt of segment k, or segment k-1 — and then publish metrics under a
    total-step tag that is wrong by up to 12k steps. Only two warm starts
    are sound: segment seg-1 at exactly SEG_STEPS (completed), or segment
    seg itself (resuming our own partial run; the step tag then
    underestimates, which is the safe direction)."""
    if seg == 0:
        return
    if warm is None:
        raise RuntimeError(
            f"segment {seg} has no checkpoint to warm-start from — training "
            "from scratch would publish a mislabeled total-step tag; re-run "
            "earlier segments (or restore the committed npz) first")
    m = re.search(rf"ckpts_{VERSION}_seg(\d+)", str(warm))
    step_m = re.search(r"(\d+)", pathlib.Path(str(warm)).name)
    warm_seg = int(m.group(1)) if m else -1
    warm_step = int(step_m.group(1)) if step_m else 0
    if warm_seg == seg:
        return
    if warm_seg == seg - 1 and warm_step == SEG_STEPS:
        return
    raise RuntimeError(
        f"segment {seg} cannot warm-start from segment {warm_seg} at step "
        f"{warm_step} ({warm}): predecessor incomplete — re-run segment "
        f"{warm_seg if warm_step != SEG_STEPS else seg - 1} first "
        "(delete its <job>.out to requeue)")


def committed_segment() -> int:
    """Segment recorded in the committed npz, or -1 if none exists."""
    if not COMMIT_NPZ.exists():
        return -1
    with np.load(COMMIT_NPZ) as z:
        if int(z["_total_steps"]) >= (int(z["_segment"]) + 1) * SEG_STEPS:
            return int(z["_segment"])
    return -1


def run_dir_finetune(steps: int = 12000,
                     dir_weight: float = 1.0,
                     base_ckpt_dir=None,
                     base_steps_k=None,
                     version_tag: str = "v7") -> None:
    """v7 exploration: fine-tune the newest v6 checkpoint with the
    translation-DIRECTION auxiliary loss (loss/losses.py
    translation_direction_loss) for one SGDR segment, then run the held-out
    pose eval. Rationale: v5/v6 held-out rotation converged to ~3 deg but
    translation direction — the other input to pose-AUC — stalled at ~40
    deg; the dq L1 underweights direction when |t_gt| is small. Writes its
    own committed npz (does NOT touch v6's warm-start chain)."""
    import jax

    from vicasplat_tpu.utils.config import load_config
    from vicasplat_tpu.main import train
    from vicasplat_tpu.data import DataModule
    from vicasplat_tpu.evaluation.pose_evaluator import (
        PoseEvalConfig, PoseEvaluator)
    from vicasplat_tpu.models import init_vicasplat
    from vicasplat_tpu.utils.checkpointing import (
        CheckpointManager, load_weights)

    ckpt_dir = CKPT_ROOT / f"ckpts_{version_tag}_dir"
    base_overrides = [
        f"dataset.synthetic.n_scenes={N_SCENES}",
        "dataset.synthetic.augment=true",
        "loss.camera.weight=2.0",
        f"loss.camera.trans_dir_weight={dir_weight}",
        f"optimizer.max_steps={steps}",
        f"trainer.max_steps={steps}",
        "checkpointing.every_n_train_steps=6000",
        f"checkpointing.output_dir={ckpt_dir.relative_to(ROOT)}",
        f"output_dir=outputs/synthetic_pose_{version_tag}/dir_ft",
        f"test.output_path=outputs/synthetic_pose_{version_tag}/dir_ft/eval",
    ]
    cfg = load_config(str(ROOT / "configs/main.yaml"),
                      experiment="synthetic_pose", overrides=base_overrides)
    bootstrap_from_committed(cfg)

    done = CheckpointManager(str(ckpt_dir), keep=5).latest()
    if done is not None and str(steps) in pathlib.Path(done).name:
        print(f"{version_tag} dir finetune already trained ({done}); "
              "eval only", flush=True)
        warm = None
    else:
        # warm-start: explicit base dir (e.g. a previous dir-ft stage) or
        # the newest v6 segment (incl. extensions 6-7)
        if base_ckpt_dir is not None:
            warm = CheckpointManager(str(base_ckpt_dir), keep=5).latest()
        else:
            warm = newest_ckpt(7)
        print(f"{version_tag} dir finetune: warm-start from {warm}",
              flush=True)
        assert warm is not None, "no v6 checkpoint to fine-tune from"
        step_m = re.search(r"(\d+)", pathlib.Path(str(warm)).name)
        if step_m and int(step_m.group(1)) != SEG_STEPS:
            raise RuntimeError(
                f"v7 fine-tune refuses a PARTIAL v6 segment ({warm}): "
                "the base tag would be wrong — finish the segment first")
        cfg = load_config(
            str(ROOT / "configs/main.yaml"), experiment="synthetic_pose",
            overrides=base_overrides + [f"checkpointing.load={warm}"])
        train(cfg)

    latest = CheckpointManager(str(ckpt_dir), keep=5).latest()
    print("evaluating ckpt:", latest, flush=True)
    params = load_weights(
        str(latest), template=init_vicasplat(jax.random.PRNGKey(0),
                                             cfg.encoder))
    # base_k comes from the warm checkpoint actually used (eval-only branch:
    # re-derive it via newest_ckpt), NOT from seg-dir existence — an empty
    # dir left by a crashed run would inflate the published tag by 12k.
    if base_steps_k is not None:
        base_k = int(base_steps_k)
    else:
        base_ckpt = warm if warm is not None else newest_ckpt(7)
        seg_m = re.search(rf"ckpts_{VERSION}_seg(\d+)", str(base_ckpt))
        if seg_m is None:
            raise RuntimeError(
                f"cannot derive base segment from warm ckpt path {base_ckpt}")
        base_k = (int(seg_m.group(1)) + 1) * SEG_STEPS // 1000
    tag = (f"trained_{N_SCENES}scenes_{base_k}k_plus_dirft{steps // 1000}k_"
           f"{version_tag}")
    out = ROOT / "outputs/tpu_pose_proof/v2_synthetic" / tag
    ev = PoseEvaluator(params, cfg.encoder, cfg.decoder,
                       PoseEvalConfig(output_path=str(out)))
    dm = DataModule(cfg.dataset, cfg.data_loader, None)
    loader = dm.test_dataloader()
    for i, batch in enumerate(loader):
        r = ev.evaluate_batch(batch)
        print(f"[test {i}] {r['scene']}: ate={r['ate']:.4f} "
              f"rpe_r={r['rpe_rot']:.3f}", flush=True)
    loader.close()
    ev.dump()
    s = ev.summary()
    rot = np.asarray(ev.metrics["rot_err_deg"])
    trans = np.asarray(ev.metrics["trans_err_deg"])
    s["rot_err_mean_deg"] = float(rot.mean())
    s["rot_err_frac_lt30"] = float((rot < 30).mean())
    s["trans_err_mean_deg"] = float(trans.mean())
    s["trans_err_frac_lt30"] = float((trans < 30).mean())
    print("TEST summary:", {k: round(v, 4) for k, v in s.items()},
          flush=True)

    prev = json.loads(SUMMARY.read_text())
    prev[tag] = dict(
        s, config=f"{version_tag} translation-direction fine-tune: {steps // 1000}k "
                  f"steps @ trans_dir_weight={dir_weight} from the newest "
                  f"v6 segment ({base_k}k); tools/pose_segments.py")
    SUMMARY.write_text(json.dumps(prev, indent=2))
    print(f"{version_tag} auc@30 (dir ft, base {base_k}k):", s.get("auc@30"),
          flush=True)

    npz = CKPT_ROOT / f"ckpt_committed/weights_{version_tag}_dir.npz"
    leaves = jax.tree_util.tree_leaves(params)
    payload = {f"arr_{i}": np.asarray(x).astype(np.float16)
               for i, x in enumerate(leaves)}
    payload["_total_steps"] = np.asarray(base_k * 1000 + steps)
    payload["_segment"] = np.asarray(100)  # out-of-band: v7 branch marker
    npz.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(npz, **payload)
    try:
        subprocess.run(["git", "add", "-f", str(npz), str(SUMMARY)],
                       cwd=ROOT, check=True, capture_output=True)
        r = subprocess.run(
            ["git", "commit", "-m",
             f"Pose {version_tag} direction-loss finetune ({base_k}k+{steps // 1000}k):"
             f" auc@30 {float(s.get('auc@30', 0.0)):.3f}, trans dir mean "
             f"{s['trans_err_mean_deg']:.1f} deg (f16 snapshot committed)"],
            cwd=ROOT, check=False, capture_output=True, text=True)
        print("git commit:", (r.stdout or r.stderr).strip()[:200], flush=True)
    except Exception as e:
        print("git commit failed (continuing):", e, flush=True)


def run_segment(seg: int) -> None:
    import jax

    # Wipe recovery: a VM recreation deletes the worker's <job>.out files,
    # so the queue re-runs every segment job. Segments whose results are
    # already committed (f16 npz + summary.json in git) must NOT re-train —
    # before this guard, a re-run of segment 0 would train FROM SCRATCH
    # (newest_ckpt(0) sees no dirs) and then overwrite the committed
    # 36k-step snapshot with a 12k-step one.
    if committed_segment() >= seg:
        print(f"segment {seg} already committed (npz at segment "
              f"{committed_segment()}); skipping", flush=True)
        return

    from vicasplat_tpu.utils.config import load_config
    from vicasplat_tpu.main import train
    from vicasplat_tpu.data import DataModule
    from vicasplat_tpu.evaluation.pose_evaluator import (
        PoseEvalConfig, PoseEvaluator)
    from vicasplat_tpu.models import init_vicasplat
    from vicasplat_tpu.utils.checkpointing import (
        CheckpointManager, load_weights)

    ckpt_dir = _seg_dir(seg)
    overrides = [
        f"dataset.synthetic.n_scenes={N_SCENES}",
        "dataset.synthetic.augment=true",
        "loss.camera.weight=2.0",
        f"optimizer.max_steps={SEG_STEPS}",
        f"trainer.max_steps={SEG_STEPS}",
        "checkpointing.every_n_train_steps=6000",
        f"checkpointing.output_dir={ckpt_dir.relative_to(ROOT)}",
        f"output_dir=outputs/synthetic_pose_{VERSION}/seg{seg}",
        f"test.output_path=outputs/synthetic_pose_{VERSION}/seg{seg}/eval",
    ]
    cfg = load_config(str(ROOT / "configs/main.yaml"),
                      experiment="synthetic_pose", overrides=overrides)
    bootstrap_from_committed(cfg)

    done = CheckpointManager(str(ckpt_dir), keep=5).latest()
    if done is not None and str(SEG_STEPS) in pathlib.Path(done).name:
        print(f"segment {seg} already trained ({done}); eval only",
              flush=True)
    else:
        warm = newest_ckpt(seg)
        print(f"segment {seg}: warm-start from {warm}", flush=True)
        _check_warm_start(seg, warm)
        if warm is not None:
            overrides.append(f"checkpointing.load={warm}")
            cfg = load_config(str(ROOT / "configs/main.yaml"),
                              experiment="synthetic_pose",
                              overrides=overrides)
        train(cfg)

    latest = CheckpointManager(str(ckpt_dir), keep=5).latest()
    print("evaluating ckpt:", latest, flush=True)
    params = load_weights(
        str(latest), template=init_vicasplat(jax.random.PRNGKey(0),
                                             cfg.encoder))

    total_steps = (seg + 1) * SEG_STEPS
    total_k = total_steps // 1000
    tag = f"trained_{N_SCENES}scenes_{total_k}k_{VERSION}"
    out = ROOT / "outputs/tpu_pose_proof/v2_synthetic" / tag
    ev = PoseEvaluator(params, cfg.encoder, cfg.decoder,
                       PoseEvalConfig(output_path=str(out)))
    dm = DataModule(cfg.dataset, cfg.data_loader, None)
    loader = dm.test_dataloader()
    for i, batch in enumerate(loader):
        r = ev.evaluate_batch(batch)
        print(f"[test {i}] {r['scene']}: ate={r['ate']:.4f} "
              f"rpe_r={r['rpe_rot']:.3f}", flush=True)
    loader.close()
    ev.dump()
    s = ev.summary()
    rot = np.asarray(ev.metrics["rot_err_deg"])
    trans = np.asarray(ev.metrics["trans_err_deg"])
    s["rot_err_mean_deg"] = float(rot.mean())
    s["rot_err_frac_lt30"] = float((rot < 30).mean())
    s["trans_err_mean_deg"] = float(trans.mean())
    s["trans_err_frac_lt30"] = float((trans < 30).mean())
    print("TEST summary:", {k: round(v, 4) for k, v in s.items()},
          flush=True)

    prev = json.loads(SUMMARY.read_text())
    prev[tag] = dict(
        s, config=f"v6 from-scratch segmented retrain: {N_SCENES} scenes + "
                  f"x-flip + camera weight 2.0, {total_k}k steps total "
                  f"(12k-step SGDR segments, tools/pose_segments.py; "
                  f"f16 snapshot committed per segment)")
    SUMMARY.write_text(json.dumps(prev, indent=2))
    print(f"auc@30 ({total_k}k):", s.get("auc@30"), flush=True)

    save_committed(params, total_steps, seg)
    git_commit_segment(seg, total_k, float(s.get("auc@30", 0.0)))
