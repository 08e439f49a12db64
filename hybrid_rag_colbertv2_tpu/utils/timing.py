"""Honest device timing — the ONE implementation of the queued-dispatch
protocol (used by bench.py and tools/stage_probe.py; keep them in sync by
keeping them HERE).

On tunneled devices (axon) ``block_until_ready`` can return before device
execution finishes, under-reporting naive timings by ~70x. The honest
protocol: measure the scalar-fetch round trip (RTT), queue N executions
back-to-back (device programs execute serially), force ONE tiny scalar
fetch, report ``(total - RTT) / N``. Validated against a data-dependency
``lax.scan`` chain (same ms/op) and against HBM-bandwidth physics.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

_RTT_MS = None


def measure_rtt_ms(force: bool = False) -> float:
    """Median scalar-fetch round-trip in ms (cached per process)."""
    global _RTT_MS
    import jax
    import jax.numpy as jnp
    import numpy as np

    if _RTT_MS is None or force:
        x = jnp.ones((8, 8), jnp.float32)
        triv = jax.jit(lambda v: jnp.sum(v))
        float(triv(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(triv(x))
            ts.append(time.perf_counter() - t0)
        _RTT_MS = float(np.median(ts)) * 1e3
    return _RTT_MS


def queued_timeit(fn: Callable, iters: int, reps: int = 3,
                  max_iters: int = 1024) -> Tuple[float, float]:
    """Per-call device ms of ``fn`` (which must return a jax array).

    Queues ``iters`` calls, fetches one scalar, subtracts the RTT; repeats
    ``reps`` times. Returns (p50_ms, worst_ms).

    ``iters`` is a FLOOR, not the final count: the queued total must
    dominate the RTT or its jitter swallows the signal (a congested
    tunnel has been measured at 200 ms RTT with +/-40 ms spread — at 16
    iters of a 3 ms kernel the subtraction lands at or below zero).
    A probe rep doubles ``iters`` until the non-RTT queued total is at
    least 3x the RTT (capped at ``max_iters``), then the timed reps run
    at that count."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rtt = measure_rtt_ms()
    scal = jax.jit(lambda v: jnp.sum(v.reshape(-1)[:1]).astype(jnp.float32))
    float(scal(fn()))  # compile fn + scalarizer, warm

    def one_rep(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn()
        float(scal(r))
        return (time.perf_counter() - t0) * 1e3

    # probe: grow the queue until compute dominates the round trip
    total = one_rep(iters)
    while total - rtt < 3.0 * rtt and iters < max_iters:
        iters = min(2 * iters, max_iters)
        total = one_rep(iters)

    ms = [max(0.0, total - rtt) / iters]   # probe rep counts as rep 1
    for _ in range(reps - 1):
        ms.append(max(0.0, one_rep(iters) - rtt) / iters)
    arr = np.asarray(ms)
    return float(np.percentile(arr, 50)), float(arr.max())
