"""Observability: device profiling traces + trace-time op statistics.

The reference's observability is wall-clock prints and the QFloat class
counters (reference qfloat.py:262-326, qfloat_matrix_inversion.py:747-755);
here those are kept (``QFloatBase.show_stats``) and extended with
``jax.profiler`` device traces for real kernel-level attribution.
"""

from __future__ import annotations

import contextlib
import json
import time


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, results: dict = None):
    """Wall-clock section timer; appends to ``results`` when given."""
    start = time.time()
    yield
    elapsed = time.time() - start
    if results is not None:
        results[label] = elapsed
    else:
        print(f"|  {label} : {elapsed:.2f} s  |")


def circuit_stats(fn, *example_args):
    """Trace ``fn`` once and report the QFloat op counts it would emit.

    The XLA analog of compiling with ``QFloat.reset_stats()`` /
    ``show_stats()`` around it (reference qfloat_matrix_inversion.py:
    1250-1281).
    """
    import jax

    from ..core.qfloat import QFloatBase

    QFloatBase.reset_stats()
    jax.eval_shape(fn, *example_args)
    return {
        "additions": QFloatBase.ADDITIONS,
        "multiplications": QFloatBase.MULTIPLICATION,
        "divisions": QFloatBase.DIVISION,
    }


def dump_stats(stats: dict, path: str = None):
    line = json.dumps(stats)
    if path:
        with open(path, "a") as fh:
            fh.write(line + "\n")
    return line
