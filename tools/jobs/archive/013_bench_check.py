"""Validate the refactored bench.py (child/parent corrupt-cache guard):
run the child path (bench.main) in-process and check it still prints the
JSON line with a sane value (~0.096 s e2e as of decomp_r3).
"""
import sys

for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "bench"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo")

import importlib.util
import io
import contextlib
import json

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    bench.main()
line = [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1]
rec = json.loads(line)
print("bench output:", rec)
assert rec["metric"] == "re10k_8view_e2e_latency"
assert 0.05 < rec["value"] < 0.2, rec
print("bench.py child path OK")
