"""Benchmark: flagship re10k_8view end-to-end inference on one TPU chip.

Workload (BASELINE.md north star): 8 unposed frames at 256x256 -> full
forward (ViT-L encoder + mix decoder + DPT heads + Gaussian adapter = 524k
Gaussians + 8 camera poses) + differentiable-rasterizer render of a 12-view
256x256 target trajectory. The reference claims ~0.1 s end-to-end on an
(unspecified) CUDA GPU (reference README.md:16).

Prints one JSON line:
  {"metric": "re10k_8view_e2e_latency", "value": <s>, "unit": "s",
   "vs_baseline": <0.1 / value>}   (>1 means faster than the reference claim)
"""
import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: first-ever run pays ~2-3 min of XLA compile,
    # later runs start in seconds
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from vicasplat_tpu.decoder.splatting import (
        DecoderSplattingConfig,
        decoder_forward,
    )
    from vicasplat_tpu.models import (
        GaussianAdapterConfig,
        VicaNetConfig,
        VicaSplatConfig,
        init_vicasplat,
        vicasplat_forward,
    )

    cfg = VicaSplatConfig(
        backbone=VicaNetConfig(),
        gaussian_adapter=GaussianAdapterConfig(sh_degree=4),
    )
    B, T, size, n_views = 1, 8, 256, 12
    params = init_vicasplat(jax.random.PRNGKey(0), cfg)
    # inference benchmark runs with bf16-resident weights (the TPU analogue
    # of the reference's TF32 matmul regime; halves weight HBM traffic)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    K = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
        (B, T, 3, 3),
    )
    batch = {
        "image": jax.random.uniform(jax.random.PRNGKey(1), (B, T, size, size, 3)) * 2 - 1,
        "intrinsics": K,
    }
    # target trajectory: small forward translations
    tgt_ext = jnp.broadcast_to(jnp.eye(4), (B, n_views, 4, 4))
    tgt_ext = tgt_ext.at[:, :, 2, 3].set(
        jnp.linspace(0.0, 0.5, n_views)[None, :]
    )
    tgt_K = jnp.broadcast_to(K[:, :1], (B, n_views, 3, 3))
    dec_cfg = DecoderSplattingConfig()

    def e2e(params, batch):
        out = vicasplat_forward(params, cfg, batch, dtype=jnp.bfloat16)
        rendered = decoder_forward(
            dec_cfg, out["gaussians"], tgt_ext, tgt_K,
            jnp.ones((B, n_views)), jnp.full((B, n_views), 100.0),
            (size, size),
        )
        return rendered.color, out["gaussian_camera_extrins"]

    # Timing methodology (validated in tools/jobs/013_timing_diag): on the
    # axon tunnel, per-dispatch overhead is ~50-70 ms and a single-element
    # pull does NOT wait for the producing computation, so a Python loop of
    # jitted calls measures the tunnel, not the chip. Instead run the
    # iterations inside ONE jitted lax.scan (a runtime-zero epsilon on the
    # input stops loop hoisting; a sum(abs(.)) of each output blocks XLA's
    # slice/reduce algebraic shortcuts), sync with a full device_get, and
    # difference two iteration counts to cancel fixed dispatch overhead.
    import numpy as np

    @jax.jit
    def loop(eps_arr, params, batch):
        def body(carry, eps):
            b = dict(batch, image=batch["image"] + eps)
            color, poses = e2e(params, b)
            s = jnp.sum(jnp.abs(color)).astype(jnp.float32)
            s = s + jnp.sum(jnp.abs(poses)).astype(jnp.float32)
            return carry + s, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), eps_arr)
        return jnp.broadcast_to(acc, (8, 128))

    def run(iters):
        t0 = time.perf_counter()
        _ = np.asarray(jax.device_get(loop(jnp.zeros((iters,), jnp.float32),
                                           params, batch))).sum()
        return time.perf_counter() - t0

    result = {"metric": "re10k_8view_e2e_latency", "unit": "s"}
    try:
        base_n, n_iters = 2, 12
        run(base_n), run(n_iters)  # compile + first-dispatch warmup
        # difference the per-phase MINIMA (not min of paired differences):
        # tunnel jitter is one-sided ~50 ms spikes, so pairing a jittered
        # base run with a clean long run biases the estimate low. Five
        # repeats per phase (was two): with ~50 ms one-sided spikes a
        # 2-repeat min still lands on a spike often enough to flip the
        # vs_baseline line (r4: 100.33 ms vs r2/r3's 96.8/97.5).
        t_base = min(run(base_n) for _ in range(5))
        t_n = min(run(n_iters) for _ in range(5))
        dt = (t_n - t_base) / (n_iters - base_n)
    except Exception as e:  # pragma: no cover - tunnel-dependent
        # The axon pool's remote-compile service drops very long compile
        # requests (~29 min: Broken pipe) and the scan-wrapped e2e graph
        # can exceed that when the persistent cache is cold. Fall back to
        # dispatch-differenced timing: on this tunnel dispatches do NOT
        # pipeline, so T(dispatch) = overhead + compute; subtracting a
        # trivial dispatch's time cancels the ~50-70 ms overhead. Noisier
        # than the in-scan method (~±10%) but it keeps the benchmark
        # producing an honest number instead of nothing.
        import sys

        print(f"scan-method failed ({type(e).__name__}); "
              f"falling back to dispatch differencing", file=sys.stderr)
        fe2e = jax.jit(e2e)
        trivial = jax.jit(lambda x: x + 1.0)
        tiny = jnp.zeros((8, 128), jnp.float32)
        import numpy as np

        def t_dispatch(f, *a):
            out = f(*a)
            np.asarray(jax.device_get(jax.tree.leaves(out)[0]))

        t_dispatch(fe2e, params, batch), t_dispatch(trivial, tiny)  # warm
        def timed(f, *a):
            t0 = time.perf_counter()
            t_dispatch(f, *a)
            return time.perf_counter() - t0

        t_full = min(timed(fe2e, params, batch) for _ in range(10))
        t_overhead = min(timed(trivial, tiny) for _ in range(10))
        dt = t_full - t_overhead
        result["method"] = "dispatch_fallback"

    result["value"] = round(dt, 5)
    result["vs_baseline"] = round(0.1 / dt, 3)
    print(json.dumps(result))


def _preempt_worker(root=None):
    """Release the TPU chip if tools/tpu_worker.py is holding it.

    Only one process can claim the chip at a time; if the driver runs this
    benchmark while the job worker is mid-queue, the bench child would
    block on the claim for up to the remaining queue length (~90 min).
    End-of-round bench outranks the queue: signal both loops to stop
    (.stop/.stopall — the keepalive honours .stopall and won't relaunch),
    then kill the worker PID directly. Every completed job has already
    committed its own artifacts, so at most the current job's uncommitted
    progress is lost. The PID is verified against /proc/<pid>/cmdline
    (must be the tpu_worker) so a stale/reused pid is never killed.
    """
    import signal
    import time as _time

    here = root or os.path.dirname(os.path.abspath(__file__))
    jobs = os.path.join(here, "tools", "jobs")
    if os.path.isdir(jobs):
        for flag in (".stop", ".stopall"):
            try:
                open(os.path.join(jobs, flag), "w").close()
            except OSError:
                pass
    pid_file = os.path.join(here, "tools", "worker.pid")
    try:
        pid = int(open(pid_file).read().strip())
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmdline = f.read().decode(errors="replace")
    except (OSError, ValueError):
        return
    if "tpu_worker" not in cmdline or pid == os.getpid():
        return
    import sys

    print(f"bench: stopping tpu_worker (pid {pid}) to free the chip",
          file=sys.stderr)
    def _gone(p):
        # a zombie (dead, not yet reaped by the keepalive) still answers
        # kill(p, 0) — read the state field from /proc instead
        try:
            stat = open(f"/proc/{p}/stat").read()
            return stat.rsplit(")", 1)[1].split()[0] == "Z"
        except OSError:
            return True

    try:
        os.kill(pid, signal.SIGTERM)
        for _ in range(60):
            _time.sleep(1)
            if _gone(pid):
                return
        os.kill(pid, signal.SIGKILL)
    except ProcessLookupError:
        pass


def _run_guarded():
    """Run main() in a child process; retry with a fresh compile cache if
    the child dies without printing the JSON line.

    A JAX process killed mid-write (timeout, tunnel outage) can leave a
    CORRUPT entry in the persistent compile cache; every later reader of
    that entry hard-aborts (SIGABRT inside
    compilation_cache.get_executable_and_time — hit on 2026-08-18). A
    signal death can't be caught in-process, so the retry has to live in a
    parent that never imports jax itself.
    """
    import subprocess
    import sys
    import tempfile

    try:
        _preempt_worker()
    except Exception as e:  # never let cleanup break the benchmark
        print(f"bench: worker preemption failed ({e}); continuing",
              file=sys.stderr)

    def attempt(env):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
        )
        sys.stderr.write(p.stderr)
        return p

    env = dict(os.environ, _VICA_BENCH_CHILD="1")
    p = attempt(env)
    if p.returncode != 0 or '"metric"' not in p.stdout:
        sys.stderr.write(p.stdout)
        sys.stderr.write(
            f"\nbench child failed (rc={p.returncode}); retrying with a "
            f"fresh compile cache\n"
        )
        env["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
            prefix="vica_bench_cache_"
        )
        p = attempt(env)
    sys.stdout.write(p.stdout)
    sys.exit(0 if '"metric"' in p.stdout else (p.returncode or 1))


if __name__ == "__main__":
    if os.environ.get("_VICA_BENCH_CHILD") == "1":
        main()
    else:
        _run_guarded()
