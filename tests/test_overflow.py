"""Overflow tracking (the reference's unimplemented TODO, qfloat.py:255-257)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from matrix_inversion_tpu.config import LOW, HIGH
from matrix_inversion_tpu.models.inverse import qfloat_matrix_inverse_with_overflow
from matrix_inversion_tpu.models.marshal import (
    float_matrix_to_mags_and_signs,
    mags_and_signs_to_float_matrix,
)
from matrix_inversion_tpu.ops.packed import PackedQFloat, track_overflow


def test_add_overflow_flagged():
    # 2**8 + 2**8 overflows a (9, 9) all-integer encoding
    big = PackedQFloat.from_float(float(2 ** 8), 9, 9, 2)
    with track_overflow() as t:
        s = big + big
        flag = t.combined()
    assert int(np.asarray(flag)) == 1
    # small values do not flag
    small = PackedQFloat.from_float(3.0, 9, 9, 2)
    with track_overflow() as t:
        _ = small + small
        flag = t.combined()
    assert int(np.asarray(flag)) == 0


def test_inverse_overflow_flags(rng):
    p = HIGH.replace(n=3)
    fn = jax.jit(
        functools.partial(
            qfloat_matrix_inverse_with_overflow,
            n=3,
            qfloat_len=p.qfloat_len,
            qfloat_ints=p.qfloat_ints,
            qfloat_base=p.qfloat_base,
            true_division=p.true_division,
        )
    )
    B = 8
    M = rng.randn(B, 3, 3) * 100
    # make one matrix near-singular so its inverse entries overflow the
    # 2**20 integer range
    M[0, 1] = M[0, 0] * (1 + 1e-12)
    mags, signs = float_matrix_to_mags_and_signs(
        M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
    )
    out_m, out_s, flag = fn(jnp.asarray(mags), jnp.asarray(signs))
    flag = np.asarray(flag)
    assert flag.shape == (B,)
    assert flag[0] == 1  # the near-singular one overflowed
    inv = mags_and_signs_to_float_matrix(
        np.asarray(out_m), np.asarray(out_s), p.qfloat_len, p.qfloat_ints, p.qfloat_base
    )
    # unflagged results are accurate
    ok = flag == 0
    if np.any(ok):
        err = np.mean(np.abs(inv[ok] - np.linalg.inv(M[ok])), axis=(1, 2))
        assert np.max(err) < 1e-2


def test_tracking_off_by_default(rng):
    # without the scope, nothing is recorded and results are unchanged
    from matrix_inversion_tpu.models.inverse import qfloat_matrix_inverse_packed_io

    p = LOW.replace(n=2)
    B = 4
    M = rng.randn(B, 2, 2) * 100
    mags, signs = float_matrix_to_mags_and_signs(
        M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
    )
    base = qfloat_matrix_inverse_packed_io(
        jnp.asarray(mags), jnp.asarray(signs), 2, p.qfloat_len, p.qfloat_ints,
        p.qfloat_base, p.true_division,
    )
    tracked = qfloat_matrix_inverse_with_overflow(
        jnp.asarray(mags), jnp.asarray(signs), 2, p.qfloat_len, p.qfloat_ints,
        p.qfloat_base, p.true_division,
    )
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(tracked[0]))
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(tracked[1]))
