"""Test configuration: force an 8-virtual-device CPU backend.

Tests run on CPU with 8 fake devices so the pjit/shard_map data-parallel
paths are exercised without real multi-chip hardware.

The ambient environment points JAX at the TPU tunnel (JAX_PLATFORMS=axon)
and its sitecustomize *initializes* that backend at interpreter start, so
setting the env var here is not enough — the config override + backend
clear below re-selects CPU even when the axon backend is already live.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")
# the ambient sitecustomize enables the persistent compilation cache; in a
# long full-suite process, re-reading a freshly written entry for one of
# the heavier executables segfaults inside
# compilation_cache.get_executable_and_time (2026-08-18, jax 0.9.0 CPU).
# Tests recompile everything anyway — disable the cache for the suite.
jax.config.update("jax_enable_compilation_cache", False)
try:  # drop any backend the sitecustomize already initialized
    import jax.extend.backend

    jax.extend.backend.clear_backends()
except Exception:
    pass

assert jax.default_backend() == "cpu", (
    f"tests require the CPU backend, got {jax.default_backend()}"
)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_xla_executables():
    """Drop compiled executables after each test module.

    A single full-suite process performs ~700 XLA-CPU compilations; with
    every executable's JIT code held live, a late huge compile (the
    grad-accumulation scan-of-train-step graph) segfaults inside
    backend_compile_and_load (jax 0.9.0, reproduced twice at ~86% of the
    suite on 2026-08-18; the same test passes in a fresh process).
    Releasing executables between modules keeps code memory bounded;
    within-module caching (the expensive repeated graphs) is unaffected.
    """
    yield
    jax.clear_caches()
