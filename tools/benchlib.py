"""Device-time measurement for the axon TPU tunnel.

Empirical facts about this backend (tools/jobs/013_timing_diag):
  - per-dispatch overhead is ~50-70 ms, dispatches do not pipeline;
  - `float(x.ravel()[0])` does NOT wait for the producing computation
    (433 ms of work was still in flight after it returned);
  - np.asarray(jax.device_get(<array>)) DOES wait.

So the only sound method is: run N iterations inside ONE jitted lax.scan,
sync with a full device_get, and difference two iteration counts to cancel
the fixed dispatch+fetch overhead:

    per_iter = (T(iters=N) - T(iters=N0)) / (N - N0)

The scan body adds a runtime-zero epsilon to the first input leaf (XLA can't
constant-fold it, so the body can't be hoisted), and one element of every
output leaf feeds the carry (nothing is DCE'd).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _perturb_first(args, eps):
    """Perturb EVERY leaf of the FIRST argument by the runtime-zero eps.

    Perturbing a single leaf is not enough: anything that depends only on
    the untouched leaves is loop-invariant and XLA hoists it out of the scan
    (measured: a full ViT backbone "ran" in -0.9 ms because only the final
    layernorm's bias was perturbed). Callers must pass the streamed input
    (image, splats, keys, ...) as the first argument.
    """
    first, rest = args[0], args[1:]
    first = jax.tree.map(
        lambda x: x + eps.astype(x.dtype) if hasattr(x, "dtype") else x, first
    )
    return (first, *rest)


def _make_loop(fn):
    @jax.jit
    def loop(eps_arr, *args):
        def body(carry, eps):
            out = fn(*_perturb_first(args, eps))
            s = carry
            for leaf in jax.tree.leaves(out):
                # sum(abs(.)) forces the FULL output: a [0]-slice lets XLA
                # slice-simplify matmuls/elementwise chains down to scalars
                # (measured "negative time"), and a plain sum of a matmul can
                # be rewritten as dot-of-rowsums; abs blocks both, and the
                # reduce fuses into the producer's epilogue (no HBM round
                # trip).
                s = s + jnp.sum(jnp.abs(jnp.asarray(leaf))).astype(jnp.float32)
            return s, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), eps_arr)
        # a (8,128) output so the sync fetch is a real array transfer
        return jnp.broadcast_to(acc, (8, 128))

    return loop


def sync(x):
    return float(np.asarray(jax.device_get(x)).sum())


def device_time(fn, *args, iters=30, base=2, repeats=2):
    """True on-device seconds per iteration of fn(*args).

    Differences min(T_n) - min(T_base) over repeats (NOT min of per-repeat
    differences): tunnel jitter is one-sided (~50 ms spikes on top of the
    true time), so the min of each phase is the robust estimate — pairing a
    jittered base run with a clean long run produced negative sub-op
    timings in the r3 decomposition (tools/jobs/011, full_bin -2.1 ms)."""
    loop = _make_loop(fn)
    e_base = jnp.zeros((base,), jnp.float32)
    e_n = jnp.zeros((iters,), jnp.float32)
    # warm both shapes (compile + first-dispatch costs)
    sync(loop(e_base, *args))
    sync(loop(e_n, *args))
    t_base = float("inf")
    t_n = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(loop(e_base, *args))
        t_base = min(t_base, time.perf_counter() - t0)
        t0 = time.perf_counter()
        sync(loop(e_n, *args))
        t_n = min(t_n, time.perf_counter() - t0)
    return (t_n - t_base) / (iters - base)
