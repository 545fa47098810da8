"""Pose-evaluation CLI: `python eval_pose.py +experiment=re10k_8view
checkpointing.load=path/to/ckpt [...]`.

Parity target: reference src/eval_pose.py:40-76 — loads the checkpoint,
runs PoseEvaluator over the test loader, dumps a metrics JSON.
"""
import sys

import jax
import numpy as np


def main(argv=None):
    from vicasplat_tpu.data import DataModule
    from vicasplat_tpu.evaluation.pose_evaluator import (
        PoseEvalConfig,
        PoseEvaluator,
    )
    from vicasplat_tpu.models import init_vicasplat
    from vicasplat_tpu.utils.config import parse_cli

    argv = sys.argv[1:] if argv is None else argv
    cfg = parse_cli(argv)

    params = init_vicasplat(jax.random.PRNGKey(cfg.seed), cfg.encoder)
    if cfg.checkpointing.load:
        from vicasplat_tpu.utils.checkpointing import load_weights

        params = load_weights(cfg.checkpointing.load, template=params)

    evaluator = PoseEvaluator(
        params, cfg.encoder, cfg.decoder,
        PoseEvalConfig(output_path=str(cfg.test.output_path) + "_pose"),
    )
    dm = DataModule(cfg.dataset, cfg.data_loader, None)
    for i, batch in enumerate(dm.test_dataloader()):
        r = evaluator.evaluate_batch(batch)
        print(f"[{i}] {r['scene']}: ate={r['ate']:.4f} "
              f"rpe_r={r['rpe_rot']:.3f} rpe_t={r['rpe_trans']:.4f}",
              flush=True)
    path = evaluator.dump()
    print("summary:", evaluator.summary())
    print("wrote", path)


if __name__ == "__main__":
    main()
