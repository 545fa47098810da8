"""Bench after replacing the max-normalize direction guard with component
clamps (cheaper). Compare: pre-guard 95.7 ms, max-normalize guard 104.1 ms."""
import sys

sys.path.insert(0, "/root/repo")

g = {"__name__": "bench_job"}
exec(open("/root/repo/bench.py").read(), g)
g["main"]()
g["main"]()
