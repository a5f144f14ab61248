"""Row-vectorized substitution: bit-exactness vs the per-row path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matrix_inversion_tpu.config import LOW, HIGH
from matrix_inversion_tpu.models.inverse import qfloat_matrix_inverse_packed_io
from matrix_inversion_tpu.models.marshal import float_matrix_to_mags_and_signs


def run(M, params, vectorize_rows, tensorize=False):
    p = params
    mags, signs = float_matrix_to_mags_and_signs(
        M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
    )
    fn = jax.jit(
        functools.partial(
            qfloat_matrix_inverse_packed_io,
            n=p.n,
            qfloat_len=p.qfloat_len,
            qfloat_ints=p.qfloat_ints,
            qfloat_base=p.qfloat_base,
            true_division=p.true_division,
            tensorize=tensorize,
            vectorize_rows=vectorize_rows,
        )
    )
    out = fn(jnp.asarray(mags), jnp.asarray(signs))
    return tuple(np.asarray(o) for o in out)


@pytest.mark.parametrize("n,params,tensorize", [
    (3, LOW, False),
    pytest.param(4, HIGH, False, marks=pytest.mark.slow),
    pytest.param(5, LOW, False, marks=pytest.mark.slow),
    pytest.param(3, LOW.replace(true_division=True), False,
                 marks=pytest.mark.slow),
    pytest.param(4, HIGH, True, marks=pytest.mark.slow),
])
def test_vec_matches_per_row(rng, n, params, tensorize):
    p = params.replace(n=n)
    M = rng.randn(6, n, n) * 100
    vec = run(M, p, True, tensorize)
    plain = run(M, p, False, tensorize)
    np.testing.assert_array_equal(vec[0], plain[0])
    np.testing.assert_array_equal(vec[1], plain[1])
