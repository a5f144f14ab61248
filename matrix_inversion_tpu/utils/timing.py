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


def timed_marginal(step, fence, state, reps, repeats=3):
    """Marginal (per-rep) cost of ``step``, robust to fixed sync overhead.

    The round-5 device trace showed that every :func:`timed_chain` pass
    pays a large FIXED cost on top of the per-rep device work — the final
    host sync through the axon tunnel, measured at 5-80 ms depending on
    the session (benchmarks/results/trace_smalln.json).  At 10 reps that
    fixed cost dominated the historical small-n numbers (n=2 "226M" vs a
    706M device-only rate the same day) and its drift across sessions is
    most of the recorded cross-round "chip window" variance.

    This helper times chains of ``reps`` and ``2*reps`` calls
    (``repeats`` passes each, medians) and differences them, cancelling
    the fixed cost exactly.  Returns ``(per_rep_s, stats)``; ``stats``
    additionally records the implied fixed overhead per pass and both raw
    chain timings, so artifacts stay auditable against the old method.
    """
    lo, lo_stats = timed_chain(step, fence, state, reps, repeats)
    hi, hi_stats = timed_chain(step, fence, state, 2 * reps, repeats)
    jitter = max(
        lo_stats["elapsed_max_s"] - lo_stats["elapsed_min_s"],
        hi_stats["elapsed_max_s"] - hi_stats["elapsed_min_s"],
    )
    # the difference only means something when it clears the pass-to-pass
    # jitter; otherwise (tiny per-rep work vs a noisy sync) flag it so
    # callers fall back to the raw chain number instead of dividing noise
    reliable = (hi - lo) > 3.0 * jitter
    per_rep = max((hi - lo) / reps, 1e-12)
    stats = {
        "per_rep_s": round(per_rep, 6),
        "fixed_overhead_s": round(lo - reps * per_rep, 4),
        "marginal_reliable": bool(reliable),
        "chain_reps": lo_stats,
        "chain_2reps": hi_stats,
        "reps": reps,
        "timing_repeats": repeats,
        "date": lo_stats["date"],
        "platform": lo_stats["platform"],
        "device_kind": lo_stats["device_kind"],
    }
    return per_rep, stats
