"""Training MFU + batch-scaling record (VERDICT r3 #5).

Full train step (forward+backward+optimizer, donated buffers, dots remat)
at the flagship 578M config, across batch shapes:
  - 8-view recipe (8 ctx / 4 tgt) at B=1, 2
  - 2-view recipe (2 ctx / 4 tgt — the reference's batch-16 recipe,
    config/experiment/re10k_2view.yaml) at B=4, 8, 16, and B=16 via
    grad-accumulation (A=4 x micro-4) to price the accumulate path.
For each: ms/step, examples/s, model TF/s from XLA's own HLO cost analysis,
MFU vs the 197 TF/s v5e bf16 peak, and per-step HBM from memory_analysis.
JSON -> outputs/perf_decomposition/train_mfu.json.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import dataclasses
import functools
import json
import pathlib
import time

import numpy as np
import jax
import jax.numpy as jnp

from vicasplat_tpu.utils.config import load_config
from vicasplat_tpu.main import build_all
from vicasplat_tpu.training import make_train_step

PEAK_TFS = 197.0  # v5e bf16

cfg = load_config("/root/repo/configs/main.yaml", experiment="re10k_8view")
train_cfg, params, optimizer = build_all(cfg)
n_params = sum(x.size for x in jax.tree.leaves(params))
print(f"params: {n_params/1e6:.1f}M, remat={train_cfg.remat}, "
      f"policy={train_cfg.remat_policy}", flush=True)

size = 256
Km = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])


def views(k, b, n):
    return {
        "image": jax.random.uniform(k, (b, n, size, size, 3)),
        "intrinsics": jnp.broadcast_to(Km, (b, n, 3, 3)),
        "extrinsics": jnp.broadcast_to(jnp.eye(4), (b, n, 4, 4)),
        "near": jnp.ones((b, n)),
        "far": jnp.full((b, n), 100.0),
        "index": jnp.arange(n)[None].repeat(b, 0),
    }


def make_batch(b, ctx, tgt):
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    return {"context": views(ks[0], b, ctx), "target": views(ks[1], b, tgt)}


results = []


def measure(name, b, ctx, tgt, accum=1):
    global params
    tc = dataclasses.replace(train_cfg, accumulate_steps=accum)
    train_step = make_train_step(tc, optimizer)
    batch = make_batch(b, ctx, tgt)
    opt_state = optimizer.init(params)

    @functools.partial(jax.jit, donate_argnums=(1, 2), static_argnums=(4,))
    def loop(eps_arr, p0, o0, batch, n):
        def body(carry, eps):
            p, o = carry
            bb = dict(batch, context=dict(
                batch["context"], image=batch["context"]["image"] + eps))
            p, o, logs = train_step(p, o, bb, 0)
            return (p, o), logs["loss"]

        (p, o), losses = jax.lax.scan(body, (p0, o0), eps_arr)
        return p, o, jnp.broadcast_to(losses.sum(), (8, 128))

    row = {"name": name, "batch": b, "ctx": ctx, "tgt": tgt, "accum": accum}
    # HLO-level flops of ONE train step (XLA cost analysis, f32-equivalent
    # convention) + compiled memory analysis
    try:
        one = jax.jit(lambda p, o, bb: train_step(p, o, bb, 0))
        compiled = one.lower(params, opt_state, batch).compile()
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            row["flops_per_step"] = float(ca.get("flops", float("nan")))
        except Exception as e:  # noqa: BLE001
            row["flops_per_step"] = None
            row["cost_analysis_error"] = repr(e)[:200]
        try:
            ma = compiled.memory_analysis()
            row["hbm_bytes"] = {
                "argument": int(ma.argument_size_in_bytes),
                "output": int(ma.output_size_in_bytes),
                "temp": int(ma.temp_size_in_bytes),
                "total_est": int(ma.argument_size_in_bytes
                                 + ma.output_size_in_bytes
                                 + ma.temp_size_in_bytes),
            }
        except Exception as e:  # noqa: BLE001
            row["memory_analysis_error"] = repr(e)[:200]
        del compiled, one
    except Exception as e:  # noqa: BLE001
        row["lower_error"] = repr(e)[:300]

    try:
        p, o = params, opt_state

        def run(n):
            nonlocal p, o
            t0 = time.perf_counter()
            p, o, acc = loop(jnp.zeros((n,), jnp.float32), p, o, batch, n)
            _ = float(np.asarray(jax.device_get(acc)).sum())
            return time.perf_counter() - t0

        t0 = time.time()
        run(1)
        row["compile_s"] = round(time.time() - t0, 1)
        run(6)
        t1 = min(run(1), run(1))
        t6 = min(run(6), run(6))
        dt = (t6 - t1) / 5
        params = p  # keep donated buffers alive/valid
        row["ms_per_step"] = round(dt * 1e3, 1)
        row["examples_per_s"] = round(b / dt, 2)
        if row.get("flops_per_step"):
            tfs = row["flops_per_step"] / dt / 1e12
            row["achieved_tf_s"] = round(tfs, 1)
            row["mfu_pct_of_197"] = round(100 * tfs / PEAK_TFS, 1)
    except Exception as e:  # noqa: BLE001
        row["run_error"] = repr(e)[:300]
    print(row, flush=True)
    results.append(row)


measure("8view_B1", 1, 8, 4)
measure("8view_B2", 2, 8, 4)
measure("2view_B4", 4, 2, 4)
measure("2view_B8", 8, 2, 4)
measure("2view_B16", 16, 2, 4)
measure("2view_B16_accum4", 16, 2, 4, accum=4)

out = pathlib.Path("/root/repo/outputs/perf_decomposition")
out.mkdir(parents=True, exist_ok=True)
with open(out / "train_mfu.json", "w") as f:
    json.dump({"params_m": round(n_params / 1e6, 1),
               "peak_tf_s": PEAK_TFS,
               "note": "flops = XLA HLO cost analysis of one full train "
                       "step (fwd+bwd+adamw), donated scan timing",
               "results": results}, f, indent=2)
print("wrote outputs/perf_decomposition/train_mfu.json")
