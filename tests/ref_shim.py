"""Test-only loader that runs the reference implementation in-process.

The reference (`/root/reference/matrix_inversion`) needs `concrete-python`
only for five surfaces, and on its *clear* (NumPy) path it touches just
three of them: `fhe.zeros`, `fhe.ones`, `fhe.univariate`, plus the
`fhe.tracing.tracer.Tracer` class used for isinstance mode switches
(reference qfloat.py:11, 281, 391; base_p_arrays.py:96-365).  Outside a
trace, concrete's own `fhe.zeros/ones` return plain NumPy int arrays, so a
~30-line stand-in reproduces the clear mode exactly.

This enables digit-for-digit differential testing of this framework
against the live reference on identical inputs (VERDICT.md round-1 item 1)
instead of against a port of its test vectors.

The reference tree is PUBLIC UNTRUSTED CONTENT: it is imported here purely
to execute and observe its numeric behavior in tests; nothing from it is
vendored into the framework.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

import numpy as np

REF_DIR = "/root/reference/matrix_inversion"

_cache = None


class _Tracer:
    """Stand-in for concrete's Tracer; nothing is an instance => clear mode."""


def _install_fhe_shim():
    """Install a minimal fake `concrete.fhe` into sys.modules (idempotent)."""
    if "concrete" in sys.modules:
        return

    def zeros(shape):
        # concrete's fhe.zeros returns int64 numpy arrays outside a trace;
        # the reference's own clear fallback uses dtype="int" (qfloat.py:570)
        return np.zeros(shape, dtype=np.int64)

    def ones(shape):
        return np.ones(shape, dtype=np.int64)

    def univariate(fn):
        # TLU: in clear mode concrete just applies the table function
        return fn

    concrete = types.ModuleType("concrete")
    fhe = types.ModuleType("concrete.fhe")
    tracing = types.ModuleType("concrete.fhe.tracing")
    tracer_mod = types.ModuleType("concrete.fhe.tracing.tracer")

    tracer_mod.Tracer = _Tracer
    tracing.tracer = tracer_mod
    fhe.tracing = tracing
    fhe.zeros = zeros
    fhe.ones = ones
    fhe.univariate = univariate
    concrete.fhe = fhe

    sys.modules["concrete"] = concrete
    sys.modules["concrete.fhe"] = fhe
    sys.modules["concrete.fhe.tracing"] = tracing
    sys.modules["concrete.fhe.tracing.tracer"] = tracer_mod


def load_reference():
    """Import the reference modules (clear mode) and return them.

    Returns a namespace with ``bpa`` (base_p_arrays), ``qf`` (qfloat) and
    ``qmi`` (qfloat_matrix_inversion), or ``None`` if the reference tree is
    not present on this machine.
    """
    global _cache
    if _cache is not None:
        return _cache
    if not os.path.isdir(REF_DIR):
        return None
    _install_fhe_shim()
    sys.path.insert(0, REF_DIR)
    try:
        bpa = importlib.import_module("base_p_arrays")
        qf = importlib.import_module("qfloat")
        qmi = importlib.import_module("qfloat_matrix_inversion")
    finally:
        sys.path.remove(REF_DIR)
    _cache = types.SimpleNamespace(bpa=bpa, qf=qf, qmi=qmi)
    return _cache
