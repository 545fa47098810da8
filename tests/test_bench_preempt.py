"""bench.py worker preemption: the end-of-round benchmark must free the
chip held by tools/tpu_worker.py without ever killing an unrelated (or
reused) PID. No TPU or jax needed — pure process/file logic.
"""
import os
import pathlib
import signal
import subprocess
import sys
import time

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import bench  # noqa: E402


def _setup_root(tmp_path):
    (tmp_path / "tools" / "jobs").mkdir(parents=True)
    return tmp_path


def test_preempt_writes_stop_flags_and_ignores_missing_pid(tmp_path):
    root = _setup_root(tmp_path)
    bench._preempt_worker(root=str(root))
    assert (root / "tools" / "jobs" / ".stop").exists()
    assert (root / "tools" / "jobs" / ".stopall").exists()


def test_preempt_never_kills_non_worker_pid(tmp_path):
    root = _setup_root(tmp_path)
    # a live process whose cmdline is NOT the tpu_worker
    p = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(30)"])
    try:
        (root / "tools" / "worker.pid").write_text(str(p.pid))
        bench._preempt_worker(root=str(root))
        assert p.poll() is None  # still alive: cmdline check refused the kill
    finally:
        p.terminate()
        p.wait()


def test_preempt_kills_verified_worker(tmp_path):
    root = _setup_root(tmp_path)
    # a live process that self-identifies as the tpu_worker in its cmdline
    script = tmp_path / "tpu_worker.py"
    script.write_text("import time\ntime.sleep(60)\n")
    p = subprocess.Popen([sys.executable, str(script)])
    try:
        (root / "tools" / "worker.pid").write_text(str(p.pid))
        t0 = time.time()
        bench._preempt_worker(root=str(root))
        # SIGTERM delivered promptly; _preempt_worker waits for exit
        assert time.time() - t0 < 30
        for _ in range(50):
            if p.poll() is not None:
                break
            time.sleep(0.1)
        assert p.poll() == -signal.SIGTERM
    finally:
        if p.poll() is None:
            p.kill()
            p.wait()


def test_preempt_handles_stale_pid(tmp_path):
    root = _setup_root(tmp_path)
    # a PID that is (almost surely) not running
    p = subprocess.Popen([sys.executable, "-c", "pass"])
    p.wait()
    (root / "tools" / "worker.pid").write_text(str(p.pid))
    bench._preempt_worker(root=str(root))  # must not raise


def test_preempt_refuses_own_pid(tmp_path, monkeypatch):
    root = _setup_root(tmp_path)
    (root / "tools" / "worker.pid").write_text(str(os.getpid()))
    # our own cmdline doesn't contain "tpu_worker", but belt-and-braces:
    # even if it did, the pid==getpid() guard must refuse
    bench._preempt_worker(root=str(root))  # must not kill the test runner
