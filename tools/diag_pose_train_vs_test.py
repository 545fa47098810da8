"""Is the translation-direction failure a generalization gap or an
optimization failure? Evaluate the 16k-step synthetic-pose checkpoint on
TRAIN scenes (0-7) vs the held-out TEST scenes with the same protocol.

If train-scene translation errors are low, the model can learn the signal
and the fix is data diversity (more scenes); if train errors are equally
bad, the optimization/conditioning is the problem.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/diag_pose_train_vs_test.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vicasplat_tpu.data.synthetic_scenes import (
    SyntheticScenesConfig, generate_scene, intrinsics_for,
)
from vicasplat_tpu.evaluation.metrics import camera_eval_metrics
from vicasplat_tpu.models import init_vicasplat
from vicasplat_tpu.models.vicasplat import vicasplat_forward
from vicasplat_tpu.utils.checkpointing import CheckpointManager, load_weights
from vicasplat_tpu.utils.config import load_config

cfg = load_config("/root/repo/configs/main.yaml", experiment="synthetic_pose")
latest = CheckpointManager(
    "/root/repo/outputs/synthetic_pose/ckpts_v2", keep=5).latest()
print("ckpt:", latest)
params = load_weights(
    str(latest), template=init_vicasplat(jax.random.PRNGKey(0), cfg.encoder))

import dataclasses as _dc

d = dict(cfg.dataset["synthetic"])
d.pop("view_sampler", None)
fields = {f.name for f in _dc.fields(SyntheticScenesConfig)}
scfg = SyntheticScenesConfig(**{
    k: tuple(v) if isinstance(v, list) else v
    for k, v in d.items() if k in fields})
enc = jax.jit(lambda p, c: vicasplat_forward(
    p, cfg.encoder, dict(c, image=c["image"] * 2 - 1), dtype=jnp.bfloat16))

# mirror the view sampler: 4 sequential context frames (the evaluator's
# test batches use the same); use frames 0..3 for determinism
def eval_scene(sid):
    sc = generate_scene(sid, scfg)
    idx = [0, 1, 2, 3]
    imgs = jnp.asarray(sc["images"][idx])[None]
    gt = sc["extrinsics"][idx]
    gt = np.linalg.inv(gt[:1]) @ gt          # frame-0 relative
    scale = np.linalg.norm(gt[-1][:3, 3])
    if scale > 1e-6:
        gt[:, :3, 3] /= scale                # baseline-1 normalization
    K = intrinsics_for(scfg)
    ctx = {
        "image": imgs,
        "intrinsics": jnp.broadcast_to(jnp.asarray(K), (1, 4, 3, 3)),
    }
    out = enc(params, ctx)
    pred = np.asarray(out["gaussian_camera_extrins"][0], np.float64)
    m = camera_eval_metrics(np.asarray(gt, np.float64), pred)
    return m


for name, ids in (("TRAIN", range(8)),
                  ("TEST", range(scfg.n_scenes + scfg.n_val_scenes,
                                 scfg.n_scenes + scfg.n_val_scenes + 8))):
    rot, trans = [], []
    for sid in ids:
        m = eval_scene(sid)
        rot.extend(m["rot_err_deg"].tolist())
        trans.extend(m["trans_err_deg"].tolist())
    rot, trans = np.asarray(rot), np.asarray(trans)
    print(f"{name}: rot mean {rot.mean():.2f} frac<30 {(rot<30).mean():.2f} | "
          f"trans mean {trans.mean():.2f} frac<30 {(trans<30).mean():.2f} "
          f"frac<60 {(trans<60).mean():.2f}")
