"""Persistent TPU worker: polls tools/jobs/*.py, execs each in-process
(sharing the live JAX/TPU context across jobs), writes <job>.out.

Avoids paying the TPU-tunnel handshake + fresh-process compile for every
experiment. Also enables the persistent compilation cache.
"""
import sys

sys.path.insert(0, "/root/repo")

import io
import contextlib
import pathlib
import time
import traceback

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

JOBS = pathlib.Path(__file__).parent / "jobs"
JOBS.mkdir(exist_ok=True)

print("worker ready:", jax.devices(), flush=True)
(JOBS / ".ready").write_text("ready")

import gc

last_work = time.time()

ALIVE = JOBS / ".alive"

while True:
    # heartbeat: the keepalive's stall watchdog includes this file in its
    # "anything recent?" find set, so a long-running job that writes nothing
    # to disk for >40 min (slow tunnel day) isn't killed mid-run. Touched per
    # poll pass, not per job, so a WEDGED worker (dropped RPC never raising)
    # still goes stale and gets killed.
    ALIVE.write_text(str(time.time()))
    for job in sorted(JOBS.glob("*.py")):
        out_path = job.with_suffix(".out")
        if out_path.exists():
            continue
        ALIVE.write_text(str(time.time()))  # job start resets the stall clock
        buf = io.StringIO()
        t0 = time.time()
        try:
            code = job.read_text()
            # fresh namespace per job: a shared dict keeps every job's
            # arrays alive (a crashed 578M-param training job left ~9 GB of
            # HBM pinned and OOM'd everything after it)
            ns = {"jax": jax}
            with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                exec(compile(code, str(job), "exec"), ns)
            status = "ok"
        except Exception:
            buf.write(traceback.format_exc())
            status = "error"
        finally:
            ns = None
            gc.collect()
        out_path.write_text(
            buf.getvalue() + f"\n[{status} in {time.time() - t0:.1f}s]\n"
        )
        print(f"job {job.name}: {status}", flush=True)
        last_work = time.time()
    if (JOBS / ".stop").exists():
        break
    # auto-exit after 10 idle minutes: an idle worker still holds the
    # chip claim, which would block the driver's end-of-round bench.py.
    # The keepalive only relaunches when pending jobs exist.
    pending = any(
        not j.with_suffix(".out").exists() for j in JOBS.glob("*.py")
    )
    if not pending and time.time() - last_work > 600:
        print("idle 10 min with empty queue — releasing the chip", flush=True)
        break
    time.sleep(2)
