"""Limb kernel tests: digit-array semantics vs integer oracles, under jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matrix_inversion_tpu.ops import limbs, radix


def rand_digits(rng, shape, p):
    return rng.randint(0, p, size=shape)


@pytest.mark.parametrize("p", [2, 5, 16])
def test_subtraction(rng, p):
    a = rand_digits(rng, (64, 12), p)
    b = rand_digits(rng, (64, 12), p)
    va, vb = radix.base_p_to_int(a, p), radix.base_p_to_int(b, p)
    diff, a_lt_b = jax.jit(
        lambda x, y: limbs.base_p_subtraction(x, y, p, True)
    )(a, b)
    np.testing.assert_array_equal(np.asarray(a_lt_b), (va < vb).astype(int))
    vd = radix.base_p_to_int(np.asarray(diff), p)
    # where a >= b the difference is exact; elsewhere it wraps mod p**n
    exact = va - vb
    np.testing.assert_array_equal(vd[va >= vb], exact[va >= vb])
    np.testing.assert_array_equal(vd, (va - vb) % (p ** 12))


@pytest.mark.parametrize("p", [2, 16])
def test_subtraction_mixed_sizes(rng, p):
    # b longer than a: extra leading digits of b force a < b when nonzero
    a = rand_digits(rng, (32, 8), p)
    b = rand_digits(rng, (32, 11), p)
    va, vb = radix.base_p_to_int(a, p), radix.base_p_to_int(b, p)
    _, a_lt_b = limbs.base_p_subtraction(jnp.asarray(a), jnp.asarray(b), p, True)
    np.testing.assert_array_equal(np.asarray(a_lt_b), (va < vb).astype(int))
    # a longer than b
    diff, a_lt_b = limbs.base_p_subtraction(jnp.asarray(b), jnp.asarray(a), p, True)
    np.testing.assert_array_equal(np.asarray(a_lt_b), (vb < va).astype(int))


@pytest.mark.parametrize("p", [2, 16])
def test_compare(rng, p):
    a = rand_digits(rng, (128, 10), p)
    b = rand_digits(rng, (128, 10), p)
    va, vb = radix.base_p_to_int(a, p), radix.base_p_to_int(b, p)
    ge = jax.jit(limbs.is_greater_or_equal)(a, b)
    np.testing.assert_array_equal(np.asarray(ge), (va >= vb).astype(int))
    eq = limbs.is_equal(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(eq), (va == vb).astype(int))


@pytest.mark.parametrize("p", [2, 4])
def test_division(rng, p):
    nd, nv = 14, 7
    dividend = rand_digits(rng, (64, nd), p)
    divisor = rand_digits(rng, (64, nv), p)
    va = radix.base_p_to_int(dividend, p)
    vb = radix.base_p_to_int(divisor, p)
    q = jax.jit(lambda x, y: limbs.base_p_division(x, y, p))(dividend, divisor)
    vq = radix.base_p_to_int(np.asarray(q), p)
    nz = vb != 0
    np.testing.assert_array_equal(vq[nz], va[nz] // vb[nz])
    # division by zero saturates every quotient digit to p-1
    if np.any(~nz):
        np.testing.assert_array_equal(
            np.asarray(q)[~nz], np.full((np.sum(~nz), nd), p - 1)
        )


@pytest.mark.parametrize("p", [2, 16])
def test_base_tidy(rng, p):
    arr = rng.randint(-(2 * p - 1), 2 * p, size=(64, 12))
    arr[:, :3] = 0  # headroom so no overflow occurs
    v = radix.base_p_to_int(arr, p)
    tidied = jax.jit(lambda x: limbs.base_tidy(x, p))(arr)
    t = np.asarray(tidied)
    assert np.all(np.abs(t) < p)
    np.testing.assert_array_equal(radix.base_p_to_int(t, p), v)


@pytest.mark.parametrize("p", [2, 16])
def test_tidy_sign_mag(rng, p):
    arr = rng.randint(-(p - 1), p, size=(64, 12))
    arr[:, :2] = 0
    v = radix.base_p_to_int(arr, p)
    mag, sign = jax.jit(lambda x: limbs.tidy_to_sign_mag(x, p))(arr)
    mag, sign = np.asarray(mag), np.asarray(sign)
    np.testing.assert_array_equal(radix.base_p_to_int(mag, p), np.abs(v))
    np.testing.assert_array_equal(sign, np.where(v >= 0, 1, -1))


def test_addition(rng):
    p = 2
    a = rand_digits(rng, (32, 10), p)
    b = rand_digits(rng, (32, 10), p)
    a[:, 0] = 0
    b[:, 0] = 0  # headroom: reference drops the final carry
    s = limbs.base_p_addition(jnp.asarray(a), jnp.asarray(b), p)
    np.testing.assert_array_equal(
        radix.base_p_to_int(np.asarray(s), p),
        radix.base_p_to_int(a, p) + radix.base_p_to_int(b, p),
    )
