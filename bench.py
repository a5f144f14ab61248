"""Headline benchmark: batched n=4 High-precision QFloat inversions/s/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "inversions/s", "vs_baseline": N/1e5}

Baseline target (BASELINE.md): >= 1e5 batched n=4 High-precision inversions
per second per TPU v5e chip.  The measured step is the full compiled device
program: digit/sign tensors in -> inverse digit/sign tensors out (packed
int64 backend).  Host-side quantization is pipelined/amortized in production
and excluded here.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from matrix_inversion_tpu import HIGH
    from matrix_inversion_tpu.models.marshal import float_matrix_to_qfloat_arrays
    from matrix_inversion_tpu.runtime.api import BatchedMatrixInversion

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    batch = int(os.environ.get("BENCH_BATCH", 1048576 if on_tpu else 256))
    reps = int(os.environ.get("BENCH_REPS", 10 if on_tpu else 2))
    repeats = int(os.environ.get("BENCH_REPEATS", 3 if on_tpu else 1))

    params = HIGH.replace(n=4)
    t0 = time.time()
    inv = BatchedMatrixInversion(params, batch, backend="packed", io="packed")
    compile_s = time.time() - t0

    rng = np.random.RandomState(0)
    M = rng.randn(batch, 4, 4) * 100
    mags, signs = inv.quantize(M)
    mags = jax.device_put(jnp.asarray(mags))
    signs = jax.device_put(jnp.asarray(signs))

    def sync(x):
        # force completion: block AND fetch one element to host (the axon
        # tunnel's block_until_ready alone is not a reliable fence)
        jax.block_until_ready(x)
        return np.asarray(x[0][0, 0])

    # warmup (also the correctness sample)
    warm = inv.run_raw(mags, signs)
    sync(warm)

    # chain reps through data dependencies (packed I/O output shapes equal
    # the input shapes), so one final host fetch fences ALL reps even where
    # async dispatch makes per-rep blocking unreliable; the single tunnel
    # round-trip is amortized over the chain.  >=3 independent timing
    # passes: the median is reported and the spread recorded (cross-day
    # chip/tunnel variance is up to ~25%, NOTES.md — a single number can't
    # tell a regression from noise).
    from matrix_inversion_tpu.utils.timing import timed_chain

    step = lambda st: inv.run_raw(*st)
    elapsed, spread = timed_chain(step, sync, (mags, signs), reps, repeats)
    throughput = batch * reps / elapsed

    # correctness spot check on a slice (single application, from warmup)
    res = inv.dequantize((np.asarray(warm[0])[:64], np.asarray(warm[1])[:64]))
    err = float(np.mean(np.abs(res - np.linalg.inv(M[:64]))))

    result = {
        "metric": "n4_high_precision_inversions_per_s_per_chip",
        "value": round(throughput, 1),
        "unit": "inversions/s",
        "vs_baseline": round(throughput / 1e5, 4),
        "batch": batch,
        "reps": reps,
        "elapsed_s": round(elapsed, 4),
        "compile_s": round(compile_s, 2),
        "mean_abs_error": err,
        "platform": platform,
        # dispersion + provenance (median over `timing_repeats` passes)
        "value_best": round(batch * reps / spread["elapsed_min_s"], 1),
        "value_worst": round(batch * reps / spread["elapsed_max_s"], 1),
        "spread_pct": spread["spread_pct"],
        "timing_repeats": spread["timing_repeats"],
        "date": spread["date"],
        "device_kind": spread["device_kind"],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
