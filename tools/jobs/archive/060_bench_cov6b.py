"""Run the driver bench workload in-process for the current e2e number."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "bench"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo")
import bench
bench.main()
