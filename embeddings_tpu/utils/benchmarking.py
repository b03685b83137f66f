"""Device-time measurement utilities.

The axon TPU relay adds ~1-30 ms per-dispatch latency, so naive
time-one-call benchmarking measures the network, not the chip. We measure
the *slope*: run the op `lo` and `hi` times inside one jitted fori_loop
(each iteration data-dependent on the last so XLA can't hoist or CSE it,
and the full output consumed so nothing is DCE'd), and divide the time
difference by the iteration difference. Fixed dispatch/RTT overhead cancels.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax


def device_time_us(body: Callable, args: Sequence, *, lo: int = 50,
                   hi: int = 200, reps: int = 3) -> float:
    """Per-iteration device time (microseconds) of body(x, *args) where x is
    args[0] and body returns an array. body must be jit-traceable."""

    def make_run(iters: int):
        @jax.jit
        def run(x, *a):
            def step(i, xc):
                o = body(xc, *a)
                # Fold a full reduction of o back into the carry: forces
                # sequential execution and consumes every output element.
                # The feedback value is a *runtime* zero (tiny float scaled
                # to nothing / truncated on int cast) that XLA cannot
                # constant-fold away.
                fb = o.sum()
                if jnp.issubdtype(x.dtype, jnp.integer):
                    return xc + (fb * 1e-30).astype(x.dtype)
                return xc * (1.0 + fb.astype(xc.dtype) * 1e-30)
            return lax.fori_loop(0, iters, step, x)[(0,) * x.ndim]
        return run

    times = []
    for iters in (lo, hi):
        run = make_run(iters)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(*args))  # host transfer = hard sync
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    return max((times[1] - times[0]) / (hi - lo) * 1e6, 1e-3)


def wallclock_throughput(fn: Callable, n_items: int, *, warmup: int = 2,
                         reps: int = 3) -> tuple[float, float]:
    """(seconds_per_call, items_per_second) for an end-to-end callable —
    includes host work and dispatch; use for serving-style numbers."""
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best, n_items / best
