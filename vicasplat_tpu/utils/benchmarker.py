"""Wall-clock benchmarking + device-memory reporting.

Parity target: reference src/misc/benchmarker.py:11-37 (context-manager
timing with per-tag averaging dumped to benchmark.json, plus peak-memory
dump). TPU version blocks on device results (block_until_ready) and reads
jax device memory stats instead of torch.cuda.
"""
from __future__ import annotations

import json
import pathlib
import time
from collections import defaultdict
from contextlib import contextmanager

import jax


class Benchmarker:
    def __init__(self):
        self.execution_times = defaultdict(list)

    @contextmanager
    def time(self, tag: str, num_calls: int = 1):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            for _ in range(num_calls):
                self.execution_times[tag].append(elapsed / num_calls)

    def time_fn(self, tag: str, fn, *args, **kwargs):
        """Time a jax computation to completion.

        On the axon backend block_until_ready (and single-element pulls)
        return before execution finishes (measured: 433 ms of work still in
        flight — tools/jobs/013_timing_diag), so completion is forced with a
        full device_get of the first output leaf.
        """
        import numpy as np

        start = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        leaves = jax.tree.leaves(out)
        if leaves:
            np.asarray(jax.device_get(leaves[0]))
        self.execution_times[tag].append(time.perf_counter() - start)
        return out

    def summarize(self) -> dict:
        """Per-tag stats. The first call of a jitted tag is dominated by XLA
        compilation (measured: 3.6 s vs 40 ms warm at count=3 in
        outputs/tpu_eval_proof round 2), so `mean_warm_s` drops call 0
        whenever there is more than one sample; `calls_s` keeps the raw
        per-call list so the artifact is never compile-polluted silently."""
        out = {}
        for tag, v in self.execution_times.items():
            warm = v[1:] if len(v) > 1 else v
            out[tag] = {
                "count": len(v),
                "mean_s": sum(v) / len(v),
                "mean_warm_s": sum(warm) / len(warm),
                "total_s": sum(v),
                "calls_s": [round(t, 6) for t in v],
            }
        return out

    def dump(self, path) -> None:
        path = pathlib.Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        with open(path, "w") as f:
            json.dump(self.summarize(), f, indent=2)

    def dump_memory(self, path) -> None:
        path = pathlib.Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        stats = {}
        for i, d in enumerate(jax.local_devices()):
            try:
                s = d.memory_stats() or {}
            except Exception:
                s = {}
            stats[f"device_{i}"] = {
                k: s.get(k)
                for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                if k in s
            }
        with open(path, "w") as f:
            json.dump(stats, f, indent=2)

    def clear_history(self) -> None:
        self.execution_times = defaultdict(list)
