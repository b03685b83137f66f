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


def profiled_device_time_us(fn: Callable, args: Sequence, *,
                            reps: int = 10,
                            name_prefix: str | None = None) -> float:
    """Per-call device time (microseconds) from a jax.profiler trace —
    exact hardware durations, immune to the relay's 1-30 ms dispatch
    jitter that makes the slope method (device_time_us) unreliable for
    sub-millisecond ops. fn must be jit-compiled (or jit-traceable; it
    is called as-is). Sums device-side event durations, optionally
    restricted to events whose name starts with name_prefix (e.g. the
    pallas kernel name); otherwise attributes the whole trace."""
    import collections
    import glob
    import gzip
    import json
    import tempfile

    out = fn(*args)
    jax.block_until_ready(out)  # compile outside the trace
    d = tempfile.mkdtemp()
    with jax.profiler.trace(d):
        for _ in range(reps):
            jax.block_until_ready(fn(*args))
    tracef = glob.glob(d + "/**/*.trace.json.gz", recursive=True)[0]
    ev = json.loads(gzip.open(tracef).read())["traceEvents"]
    # device events live under TPU core pids; host threads duplicate some
    # names. Keep "X" complete events from pids whose process name labels
    # a TPU/device track; fall back to all X events if none matched.
    pid_names = {e["pid"]: e.get("args", {}).get("name", "")
                 for e in ev if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device:" in n or "Chip" in n}
    dur: collections.Counter = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        dur[e.get("name", "?")] += e["dur"]
    if name_prefix is not None:
        tot = sum(us for n, us in dur.items() if n.startswith(name_prefix))
    else:
        tot = sum(dur.values())
    return tot / reps


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
