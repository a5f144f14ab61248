"""The precision sweep's big-error outliers are reference-identical.

Round-1 verdict item 2 ("root-cause the High-preset big-error anomalies"):
benchmarks/outlier_analysis.py found every outlier in the seeded
10,000-run High sweep (n=2: 4, n=5: 3, n=10: 1) and showed the LIVE
reference produces the identical error on the same matrix.  This test
replays the recorded outlier matrices digit-for-digit through both
implementations so the conclusion stays pinned: the big errors are a
property of the shared exact-QFloat algorithm on ill-conditioned /
overflowing draws, not a framework defect (reference README.md:119-121
documents overflow as the known big-error source).
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import ref_shim

from matrix_inversion_tpu import HIGH
from matrix_inversion_tpu.models.inverse import qfloat_matrix_inverse
from matrix_inversion_tpu.models.marshal import float_matrix_to_qfloat_arrays

REF = ref_shim.load_reference()
OUTLIERS = os.path.join(
    os.path.dirname(__file__), "..", "benchmarks", "results", "outliers.json"
)

pytestmark = [
    pytest.mark.skipif(REF is None, reason="reference tree not present"),
    pytest.mark.skipif(not os.path.exists(OUTLIERS), reason="no outliers.json"),
    pytest.mark.slow,
]


def _cases():
    with open(OUTLIERS) as fh:
        data = json.load(fh)
    for key, entry in sorted(data.items()):
        n = int(key.split("n=")[1])
        for i, o in enumerate(entry["outliers"]):
            yield f"{key}#{i}", n, np.asarray(o["matrix"]), o


@pytest.mark.parametrize("name,n,M,meta", list(_cases()), ids=lambda c: c if isinstance(c, str) else "")
def test_outlier_matrix_is_reference_identical(name, n, M, meta):
    p = HIGH.replace(n=n)
    arrays, signs = REF.qmi.float_matrix_to_qfloat_arrays(
        M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
    )
    ref_out = np.asarray(
        REF.qmi.qfloat_matrix_inverse(
            arrays, signs, n, p.qfloat_len, p.qfloat_ints, p.qfloat_base,
            p.true_division,
        )
    )
    d, s = float_matrix_to_qfloat_arrays(
        M[None], p.qfloat_len, p.qfloat_ints, p.qfloat_base
    )
    lowering = "unroll" if n == 2 else "scan"
    our_out = np.asarray(
        jax.jit(
            lambda dd, ss: qfloat_matrix_inverse(
                dd, ss, n, p.qfloat_len, p.qfloat_ints, p.qfloat_base,
                p.true_division, backend="packed", lowering=lowering,
            )
        )(jnp.asarray(d), jnp.asarray(s))
    )[0]
    np.testing.assert_array_equal(
        our_out, ref_out,
        err_msg=f"outlier {name} diverges from the live reference",
    )
