"""The bench.py corrupt-cache guard: the parent retries the child with a
fresh compile cache when the first attempt dies without the JSON line
(the SIGABRT-from-a-corrupt-persistent-cache-entry signature), and never
imports jax itself (so it can't be killed by the same abort)."""
import importlib.util


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", "/root/repo/bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Proc:
    def __init__(self, returncode, stdout, stderr=""):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


def test_retry_on_sigabrt_then_success(monkeypatch, capsys):
    bench = _load_bench()
    calls = []

    def fake_run(cmd, env=None, capture_output=None, text=None):
        calls.append(dict(env))
        if len(calls) == 1:
            return _Proc(-6, "", "Fatal Python error: Aborted")
        return _Proc(0, '{"metric": "m", "value": 1}\n')

    import subprocess

    monkeypatch.setattr(subprocess, "run", fake_run)
    try:
        bench._run_guarded()
    except SystemExit as e:
        assert e.code == 0
    assert len(calls) == 2
    # the retry must point the child at a DIFFERENT, fresh cache dir
    assert "JAX_COMPILATION_CACHE_DIR" in calls[1]
    assert calls[1]["JAX_COMPILATION_CACHE_DIR"] != calls[0].get(
        "JAX_COMPILATION_CACHE_DIR"
    )
    out = capsys.readouterr()
    assert '{"metric": "m", "value": 1}' in out.out


def test_single_attempt_when_json_appears(monkeypatch, capsys):
    bench = _load_bench()
    calls = []

    def fake_run(cmd, env=None, capture_output=None, text=None):
        calls.append(1)
        return _Proc(0, '{"metric": "m", "value": 2}\n')

    import subprocess

    monkeypatch.setattr(subprocess, "run", fake_run)
    try:
        bench._run_guarded()
    except SystemExit as e:
        assert e.code == 0
    assert len(calls) == 1
