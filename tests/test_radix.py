"""Radix conversion tests (reference semantics, vectorized)."""

import numpy as np
import pytest

from matrix_inversion_tpu.ops import radix


def scalar_int_to_base_p(integer, n, p):
    """Independent scalar oracle for digit decomposition."""
    sgn = -1 if integer < 0 else (0 if integer == 0 else 1)
    mag = abs(int(integer))
    digits = []
    for i in reversed(range(n)):
        d, mag = divmod(mag, p ** i)
        digits.append(d)
    return [d * sgn for d in digits]


@pytest.mark.parametrize("p", [2, 3, 10, 16])
def test_int_round_trip(rng, p):
    xs = rng.randint(-(p ** 6), p ** 6, size=50)
    digits = radix.int_to_base_p(xs, 7, p)
    assert digits.shape == (50, 7)
    back = radix.base_p_to_int(digits, p)
    np.testing.assert_array_equal(back, xs)
    # digit-exactness vs the scalar oracle
    for k in range(10):
        assert list(digits[k]) == scalar_int_to_base_p(xs[k], 7, p)


@pytest.mark.parametrize("p", [2, 16])
def test_float_round_trip(rng, p):
    xs = rng.uniform(-1, 1, size=64) * 0.999
    digits = radix.float_to_base_p(xs, 30, p)
    back = radix.base_p_to_float(digits, p)
    np.testing.assert_allclose(back, xs, atol=float(p) ** -28)


def test_quantize_dequantize(rng):
    f = (rng.randint(0, 20000, size=100) - 10000) / 100.0
    digits, sign = radix.float_to_digits_and_sign(f, 32, 16, 2)
    assert np.all(digits >= 0)
    assert set(np.unique(sign)).issubset({-1, 1})
    back = radix.digits_and_sign_to_float(digits, sign, 16, 2)
    np.testing.assert_allclose(back, f, atol=1e-4)
    # zero has sign +1 (reference qfloat.py:394)
    d0, s0 = radix.float_to_digits_and_sign(0.0, 10, 5, 2)
    assert s0 == 1 and np.all(d0 == 0)


def test_pack_unpack(rng):
    digits = rng.randint(0, 2, size=(40, 35))
    mag = radix.pack_digits(digits, 2)
    back = radix.unpack_digits(mag, 35, 2)
    np.testing.assert_array_equal(back, digits)
    digits16 = rng.randint(0, 16, size=(40, 12))
    mag16 = radix.pack_digits(digits16, 16)
    np.testing.assert_array_equal(radix.unpack_digits(mag16, 12, 16), digits16)
