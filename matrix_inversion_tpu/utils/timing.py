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
