"""Precision / error benchmark: the reference's 10,000-inversion sweep.

Reference ``debug_qfloat_inverse_python`` (qfloat_matrix_inversion.py:
883-970) loops N scalar inversions in Python; here the whole sweep is a few
batched device programs.  Reports mean |QFloat inverse - exact inverse| and
the big-error rate (share of runs with mean error > 1), i.e. README Table 1
methodology.
"""

from __future__ import annotations

import functools

import numpy as np

from ..config import QFloatParams
from ..models.inverse import qfloat_matrix_inverse
from ..models.marshal import (
    float_matrix_to_qfloat_arrays,
    qfloat_and_signs_arrays_to_float_matrix,
)


def precision_benchmark(
    params: QFloatParams,
    sampler=None,
    N: int = 10000,
    batch_size: int = 2048,
    seed: int = 0,
    backend: str = None,
    verbose: bool = False,
):
    """Run N random inversions, return error statistics.

    ``sampler(batch_shape) -> (..., n, n)`` defaults to normal(0, 100)
    (reference main.py:119).
    """
    import jax
    import jax.numpy as jnp

    p = params
    backend = backend or p.resolve_backend()
    rng = np.random.RandomState(seed)
    if sampler is None:
        sampler = lambda b: rng.standard_normal((b, p.n, p.n)) * 100

    fn = jax.jit(
        functools.partial(
            qfloat_matrix_inverse,
            n=p.n,
            qfloat_len=p.qfloat_len,
            qfloat_ints=p.qfloat_ints,
            qfloat_base=p.qfloat_base,
            true_division=p.true_division,
            tensorize=p.tensorize,
            backend=backend,
        )
    )

    errors = []
    done = 0
    while done < N:
        b = min(batch_size, N - done)
        M = sampler(b)
        digits, signs = float_matrix_to_qfloat_arrays(
            M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
        )
        # pad to the compiled batch size to reuse the executable
        if b < batch_size:
            pad = batch_size - b
            digits = np.concatenate([digits, np.zeros((pad,) + digits.shape[1:], digits.dtype)])
            signs = np.concatenate([signs, np.ones((pad,) + signs.shape[1:], signs.dtype)])
        out = np.asarray(fn(jnp.asarray(digits), jnp.asarray(signs)))[:b]
        inv = qfloat_and_signs_arrays_to_float_matrix(out, p.qfloat_ints, p.qfloat_base)
        exact = np.linalg.inv(M)
        err = np.mean(np.abs(inv - exact), axis=(1, 2))
        errors.append(err)
        done += b
        if verbose:
            print(f"  {done}/{N}")

    errors = np.concatenate(errors)
    stats = {
        "n": p.n,
        "N": int(N),
        "mean_error": float(np.mean(errors)),
        "median_error": float(np.median(errors)),
        "max_error": float(np.max(errors)),
        "big_error_rate_pct": float(100.0 * np.mean(errors > 1.0)),
        "backend": backend,
    }
    if verbose:
        print("mean error :", stats["mean_error"])
        print("big error rate :" + str(stats["big_error_rate_pct"]) + " %")
    return stats


def time_benchmark(params: QFloatParams, values_n=(2, 3), filename=None, reps=3,
                   batch_size=1024, backend=None, sampler=None):
    """Wall-clock compile/run sweep (reference qfloat_matrix_inversion.py:
    1148-1188), writing the same style of log file."""
    import time as _time

    import jax
    import jax.numpy as jnp

    lines = []

    def write(text):
        lines.append(text)
        if filename:
            with open(filename, "a") as fh:
                fh.write(text)

    if filename:
        with open(filename, "w") as fh:
            fh.truncate(0)

    results = {}
    for n in values_n:
        p = params.replace(n=n)
        be = backend or p.resolve_backend()
        rng = np.random.RandomState(0)
        samp = sampler or (lambda b: rng.standard_normal((b, n, n)) * 100)
        write(f"Benchmark for n = {n}\n")
        times = []
        fn = functools.partial(
            qfloat_matrix_inverse,
            n=n,
            qfloat_len=p.qfloat_len,
            qfloat_ints=p.qfloat_ints,
            qfloat_base=p.qfloat_base,
            true_division=p.true_division,
            tensorize=p.tensorize,
            backend=be,
        )
        M = samp(batch_size)
        digits, signs = float_matrix_to_qfloat_arrays(
            M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
        )
        digits, signs = jnp.asarray(digits), jnp.asarray(signs)

        t0 = _time.time()
        compiled = jax.jit(fn).lower(digits, signs).compile()
        compile_t = _time.time() - t0
        write(f"compilation :{compile_t}\n")

        for k in range(reps):
            t0 = _time.time()
            out = compiled(digits, signs)
            jax.block_until_ready(out)
            _ = np.asarray(out[0, 0, 0])
            run_t = _time.time() - t0
            times.append(run_t)
            write(f"{k + 1}\nrunning     :{run_t}\n")
        mean_t = float(np.mean(times))
        write(f"\nmean :{mean_t}\n\n\n")
        results[n] = {
            "compile_s": compile_t,
            "mean_run_s": mean_t,
            "inversions_per_s": batch_size / mean_t,
        }
    return results
