"""Segmented pose-generalization retrain (round 4 continuation).

The 08-19 VM recreation lost outputs/synthetic_pose/ckpts_v3/v4 (the
512-/2048-scene checkpoints behind the committed auc@30 0.173/0.222), so
the planned 48k warm-start (archive/050) is impossible — this retrains
from scratch with BOTH proven levers turned up: scene diversity 2048 ->
4096 (the 64->512->2048 sweep moved held-out auc@30 0.030 -> 0.173 ->
0.222) and optimization length 24k -> 48k (train PSNR was ~10.5 and still
falling at 24k — under-trained, not capacity-bound).

Run as FOUR 12k-step segment jobs (tools/jobs/051{a-d}) rather than one
48k job: the worker re-execs unfinished jobs from the top after a tunnel
outage, so segment granularity bounds lost work to <=12k steps. Segments
warm-start from the newest checkpoint across all segment dirs
(weights-only -> fresh optimizer + 12k cosine per segment, i.e. SGDR-style
warm restarts — same semantics the archived 050 job deliberately chose).
Each segment ends with the full held-out pose eval (8 test scenes through
evaluation/pose_evaluator.py, reference protocol
src/evaluation/pose_evaluator.py:34-245) appended to
outputs/tpu_pose_proof/v2_synthetic/summary.json, so ANY completed
segment leaves a committed-able metric even if the round ends mid-run.
"""
import json
import pathlib
import re

import numpy as np

ROOT = pathlib.Path("/root/repo")
CKPT_ROOT = ROOT / "outputs/synthetic_pose"
SUMMARY = ROOT / "outputs/tpu_pose_proof/v2_synthetic/summary.json"
N_SCENES = 4096
SEG_STEPS = 12000
N_SEGMENTS = 4


def newest_ckpt(upto_seg: int):
    """Newest checkpoint across segment dirs 0..upto_seg by (seg, step)."""
    from vicasplat_tpu.utils.checkpointing import CheckpointManager

    best = None
    for seg in range(upto_seg + 1):
        d = CKPT_ROOT / f"ckpts_v5_seg{seg}"
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


def run_segment(seg: int) -> None:
    import jax

    from vicasplat_tpu.utils.config import load_config
    from vicasplat_tpu.main import train
    from vicasplat_tpu.data import DataModule
    from vicasplat_tpu.evaluation.pose_evaluator import (
        PoseEvalConfig, PoseEvaluator)
    from vicasplat_tpu.models import init_vicasplat
    from vicasplat_tpu.utils.checkpointing import (
        CheckpointManager, load_weights)

    ckpt_dir = CKPT_ROOT / f"ckpts_v5_seg{seg}"
    done = CheckpointManager(str(ckpt_dir), keep=5).latest()
    if done is not None and str(SEG_STEPS) in pathlib.Path(done).name:
        print(f"segment {seg} already trained ({done}); eval only",
              flush=True)
        warm = None
    else:
        warm = newest_ckpt(seg)
        print(f"segment {seg}: warm-start from {warm}", flush=True)

    overrides = [
        f"dataset.synthetic.n_scenes={N_SCENES}",
        "dataset.synthetic.augment=true",
        "loss.camera.weight=2.0",
        f"optimizer.max_steps={SEG_STEPS}",
        f"trainer.max_steps={SEG_STEPS}",
        "checkpointing.every_n_train_steps=6000",
        f"checkpointing.output_dir=outputs/synthetic_pose/ckpts_v5_seg{seg}",
        f"output_dir=outputs/synthetic_pose_v5/seg{seg}",
        f"test.output_path=outputs/synthetic_pose_v5/seg{seg}/eval",
    ]
    if warm is not None:
        overrides.append(f"checkpointing.load={warm}")
    cfg = load_config(str(ROOT / "configs/main.yaml"),
                      experiment="synthetic_pose", overrides=overrides)

    if done is None or str(SEG_STEPS) not in pathlib.Path(done).name:
        train(cfg)

    latest = CheckpointManager(str(ckpt_dir), keep=5).latest()
    print("evaluating ckpt:", latest, flush=True)
    params = load_weights(
        str(latest), template=init_vicasplat(jax.random.PRNGKey(0),
                                             cfg.encoder))

    total_k = (seg + 1) * SEG_STEPS // 1000
    tag = f"trained_{N_SCENES}scenes_{total_k}k"
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
        s, config=f"from-scratch segmented retrain: {N_SCENES} scenes + "
                  f"x-flip + camera weight 2.0, {total_k}k steps total "
                  f"(12k-step SGDR segments, tools/pose_segments.py; "
                  f"ckpt {ckpt_dir.relative_to(ROOT)})")
    SUMMARY.write_text(json.dumps(prev, indent=2))
    print(f"auc@30 ({total_k}k):", s.get("auc@30"), flush=True)
