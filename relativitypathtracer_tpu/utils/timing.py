"""Relay-aware frame-timing helpers -- the ONE implementation of the
protocol every timing consumer (bench.py, tools/frametime.py,
tools/round4_one_claim.py) must share.

On the axon TPU relay `block_until_ready()` does not synchronize and every
scalar fetch costs a round trip, so per-frame times are unmeasurable
directly. The honest estimator this transport allows: time BATCHES of
chained frames ended by one tiny scalar fetch, with the fetch round-trip
measured separately and subtracted (see ROADMAP "Timing methodology").
Renderers must take data as traced arguments (nullary closures
constant-fold). Callers need not pre-warm: helpers run one settle frame
before measuring the RTT.
"""

from __future__ import annotations

import time


def _img_of(out):
    """First array of a renderer output (render fns may return (img, aux))."""
    return out[0] if isinstance(out, tuple) else out


def fetch_rtt(img, tries: int = 3) -> float:
    """Min observed scalar-fetch round trip for an already-computed array."""
    import jax.numpy as jnp

    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        _ = float(jnp.sum(img))
        best = min(best, time.perf_counter() - t0)
    return best


def chained_samples_ms(render, scene, state, nbatch: int = 10,
                       batch: int = 12):
    """`nbatch` per-frame-mean samples (ms), each over `batch` chained frames.

    Warms the compile, measures the fetch RTT, then times each batch with
    one scalar fetch and the RTT subtracted. Returns (samples, first_out):
    the UNSORTED sample list and the warm-up render output (for callers
    that need aux counters)."""
    import jax.numpy as jnp

    out = render(scene, state)
    _ = float(jnp.sum(_img_of(out)))  # settle compile + queue
    rtt = fetch_rtt(_img_of(out))
    samples = []
    for _b in range(nbatch):
        t0 = time.perf_counter()
        for _i in range(batch):
            out2 = render(scene, state)
        _ = float(jnp.sum(_img_of(out2)))
        samples.append(max(time.perf_counter() - t0 - rtt, 1e-9) / batch * 1e3)
    return samples, out


def chained_frametime_ms(render, scene, state, reps: int = 3,
                         batch: int = 12) -> float:
    """Best-of-`reps` mean per-frame ms (the sweep/frametime estimator)."""
    samples, _ = chained_samples_ms(render, scene, state, nbatch=reps,
                                    batch=batch)
    return min(samples)


def percentile(sorted_vals, q: float) -> float:
    """Linear-interpolated percentile of an ascending list (q in [0, 100])."""
    n = len(sorted_vals)
    pos = (n - 1) * q / 100.0
    lo = int(pos)
    hi = min(lo + 1, n - 1)
    return sorted_vals[lo] + (sorted_vals[hi] - sorted_vals[lo]) * (pos - lo)
