"""Packed-I/O circuit: numerical identity with the digit-I/O circuit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matrix_inversion_tpu.config import LOW, HIGH
from matrix_inversion_tpu.models import marshal
from matrix_inversion_tpu.runtime.api import BatchedMatrixInversion


@pytest.mark.parametrize(
    "n,params",
    [(2, LOW), (3, LOW), pytest.param(4, HIGH, marks=pytest.mark.slow)],
)
def test_packed_io_matches_digit_io(rng, n, params):
    p = params.replace(n=n)
    B = 8
    M = rng.randn(B, n, n) * 100

    dig = BatchedMatrixInversion(p, B, backend="packed", io="digits")
    pck = BatchedMatrixInversion(p, B, backend="packed", io="packed")
    out_d = dig.run(M)
    out_p = pck.run(M)
    np.testing.assert_array_equal(out_d, out_p)


def test_packed_io_marshal_roundtrip(rng):
    p = HIGH.replace(n=3)
    M = rng.randn(5, 3, 3) * 100
    mags, signs = marshal.float_matrix_to_mags_and_signs(
        M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
    )
    # identical to digit-path quantization + packing
    digits, signs2 = marshal.float_matrix_to_qfloat_arrays(
        M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
    )
    from matrix_inversion_tpu.ops import radix

    np.testing.assert_array_equal(mags, radix.pack_digits(digits, p.qfloat_base))
    np.testing.assert_array_equal(signs, signs2)
    back = marshal.mags_and_signs_to_float_matrix(
        mags, signs, p.qfloat_len, p.qfloat_ints, p.qfloat_base
    )
    np.testing.assert_allclose(back, M, atol=1e-5)


def test_packed_io_requires_packed_backend():
    with pytest.raises(ValueError):
        BatchedMatrixInversion(LOW.replace(n=2, qfloat_base=3), 4, io="packed")
