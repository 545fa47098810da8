"""Re-run the e2e bench after projection.py robustness changes (overflow-free
SH direction norm + culled-splat payload zeroing) to check for regression.
Round-3 baseline to hold: 95.7 ms (vs_baseline 1.045)."""
import sys

sys.path.insert(0, "/root/repo")

g = {"__name__": "bench_job"}
exec(open("/root/repo/bench.py").read(), g)
g["main"]()
