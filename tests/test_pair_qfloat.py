"""Bit-exactness of the uint32-pair backend vs the packed int64 backend.

PairQFloat (ops/pair_qfloat.py) is the number type the fused Pallas kernel
runs on; these property tests prove every operation reproduces PackedQFloat
(itself digit-exact with the limb backend and the live reference) EXACTLY —
eagerly on CPU, no Pallas involved.
"""

import numpy as np
import pytest

from matrix_inversion_tpu.core.qfloat import SignedBinary, Zero
from matrix_inversion_tpu.ops.packed import PackedQFloat
from matrix_inversion_tpu.ops import pair_qfloat as pq
from matrix_inversion_tpu.ops.pair_qfloat import PairQFloat


# widest length per base that the packed encodings allow: base**len < 2**62
# everywhere, and division dividends (len + frac digits) still < 2**62
_LEN_INTS = {2: (23, 9), 4: (14, 5), 16: (9, 4)}


def rand_qf(rng, B=64, length=None, ints=None, base=2, allow_zero_sign=False):
    if length is None:
        length, ints = _LEN_INTS[base]
    digits = rng.randint(0, base, size=(B, length))
    choices = [-1, 0, 1] if allow_zero_sign else [-1, 1]
    signs = rng.choice(choices, size=B)
    pk = PackedQFloat.from_digits(digits, ints, base, signs)
    return pk, PairQFloat.from_packed(pk)


def assert_same(pk, pr):
    if isinstance(pk, Zero):
        assert isinstance(pr, Zero)
        return
    pr_pk = pr.to_packed()
    assert len(pk) == len(pr_pk) and pk.ints == pr_pk.ints and pk.base == pr_pk.base
    np.testing.assert_array_equal(np.asarray(pk.mag), np.asarray(pr_pk.mag))
    np.testing.assert_array_equal(
        np.broadcast_to(np.asarray(pk.sign), pk.bshape),
        np.broadcast_to(np.asarray(pr_pk.sign), pr_pk.bshape),
    )


@pytest.mark.parametrize("base", [2, 4, 16])
def test_add_sub_parity(rng, base):
    pk1, pr1 = rand_qf(rng, base=base)
    pk2, pr2 = rand_qf(rng, base=base, allow_zero_sign=True)
    assert_same(pk1 + pk2, pr1 + pr2)
    assert_same(pk1 - pk2, pr1 - pr2)
    assert_same(pk1 + 3, pr1 + 3)
    assert_same(pk1 + (-2), pr1 + (-2))
    assert_same(pk1 + SignedBinary(-1), pr1 + SignedBinary(-1))
    sb = rng.choice([-1, 0, 1], size=64)
    assert_same(pk1 + SignedBinary(np.asarray(sb)), pr1 + SignedBinary(np.asarray(sb)))
    assert_same(pk1 + Zero(), pr1 + Zero())


@pytest.mark.parametrize("base", [2, 4, 16])
def test_compare_parity(rng, base):
    pk1, pr1 = rand_qf(rng, base=base, allow_zero_sign=True)
    pk2, pr2 = rand_qf(rng, base=base, allow_zero_sign=True)
    np.testing.assert_array_equal(np.asarray(pk1 > pk2), np.asarray(pr1 > pr2))
    np.testing.assert_array_equal(np.asarray(pk1 >= pk2), np.asarray(pr1 >= pr2))
    np.testing.assert_array_equal(np.asarray(pk1 == pk2), np.asarray(pr1 == pr2))
    np.testing.assert_array_equal(np.asarray(pk1 == pk1), np.asarray(pr1 == pr1))


@pytest.mark.parametrize("base", [2, 4, 16])
def test_mul_parity(rng, base):
    pk1, pr1 = rand_qf(rng, base=base)
    pk2, pr2 = rand_qf(rng, base=base, allow_zero_sign=True)
    assert_same(pk1 * pk2, pr1 * pr2)
    assert_same(pk1 * 5, pr1 * 5)
    assert_same(pk1 * (-3), pr1 * (-3))
    assert_same(pk1 * SignedBinary(-1), pr1 * SignedBinary(-1))
    assert_same(
        PackedQFloat.from_mul(pk1, pk2), PairQFloat.from_mul(pr1, pr2)
    )


def test_from_mul_crop_corners(rng):
    """The reference's cross-format crop case (18,18)x(25,0)->(18,1)."""
    d1 = rng.randint(0, 2, size=(32, 18))
    d2 = rng.randint(0, 2, size=(32, 25))
    s1 = rng.choice([-1, 1], size=32)
    s2 = rng.choice([-1, 1], size=32)
    pk1 = PackedQFloat.from_digits(d1, 18, 2, s1)
    pk2 = PackedQFloat.from_digits(d2, 0, 2, s2)
    pr1 = PairQFloat.from_packed(pk1)
    pr2 = PairQFloat.from_packed(pk2)
    assert_same(
        PackedQFloat.from_mul(pk1, pk2, 18, 1), PairQFloat.from_mul(pr1, pr2, 18, 1)
    )
    # widened 2x2-closed-form format
    pk3, pr3 = rand_qf(rng, length=40, ints=20)
    pk4, pr4 = rand_qf(rng, length=40, ints=20)
    assert_same(
        PackedQFloat.from_mul(pk3, pk4, 43, 40), PairQFloat.from_mul(pr3, pr4, 43, 40)
    )


@pytest.mark.parametrize("base", [2, 4, 16])
def test_mul_trunc_vs_window_formats(rng, base):
    """The algebraic multiply (pair_math.mul_truncated, default) is
    digit-exact with both the windowed pair form AND the packed reference
    across random (a_len, a_ints) x (b_len, b_ints) -> (newlength, newints)
    format combinations — including all-fraction reciprocal operands
    (t1 > a_len) and widening outputs (t1 <= 0)."""
    from matrix_inversion_tpu.ops import pair_qfloat as pq

    maxlen = {2: 40, 4: 20, 16: 10}[base]
    try:
        for _ in range(40):
            a_len = rng.randint(2, maxlen + 1)
            b_len = rng.randint(2, maxlen + 1)
            fmt = (
                a_len, rng.randint(0, a_len + 1),
                b_len, rng.randint(0, b_len + 1),
            )
            newlength = rng.randint(2, maxlen + 1)
            newints = rng.randint(0, newlength + 1)
            pk1, pr1 = rand_qf(rng, 16, fmt[0], fmt[1], base)
            pk2, pr2 = rand_qf(rng, 16, fmt[2], fmt[3], base)
            ref = PackedQFloat.from_mul(pk1, pk2, newlength, newints)
            pq.set_mul_impl("window")
            win = PairQFloat.from_mul(pr1, pr2, newlength, newints)
            pq.set_mul_impl("trunc")
            trn = PairQFloat.from_mul(pr1, pr2, newlength, newints)
            assert_same(ref, win)
            assert_same(ref, trn)
        # the L-column reciprocal multiply: (len, ints) x (len, 0) -> (len, ints)
        length, ints = _LEN_INTS[base]
        pk1, pr1 = rand_qf(rng, base=base)
        pk2, pr2 = rand_qf(rng, 64, length, 0, base)
        assert_same(
            PackedQFloat.from_mul(pk1, pk2, length, ints),
            PairQFloat.from_mul(pr1, pr2, length, ints),
        )
    finally:
        pq.set_mul_impl("trunc")


@pytest.mark.parametrize("base", [2, 4])
def test_div_parity(rng, base):
    length, ints = _LEN_INTS[base]
    pk1, pr1 = rand_qf(rng, base=base)
    pk2, pr2 = rand_qf(rng, base=base)
    assert_same(pk1 / pk2, pr1 / pr2)
    # division by an encrypted zero saturates
    z = np.zeros((64, length), dtype=np.int64)
    pkz = PackedQFloat.from_digits(z, ints, base, np.ones(64, np.int64))
    prz = PairQFloat.from_packed(pkz)
    assert_same(pk1 / pkz, pr1 / prz)
    # division by SignedBinary: +-1 flips sign, 0 saturates
    for v in (1, -1, 0):
        assert_same(pk1 / SignedBinary(v), pr1 / SignedBinary(v))
    sb = np.asarray(rng.choice([-1, 0, 1], size=64))
    assert_same(pk1 / SignedBinary(sb), pr1 / SignedBinary(sb))


@pytest.mark.parametrize("base", [2, 4])
def test_invert_parity(rng, base):
    length, ints = _LEN_INTS[base]
    pk1, pr1 = rand_qf(rng, base=base)
    assert_same(pk1.invert(1, length, 0), pr1.invert(1, length, 0))
    assert_same(
        pk1.invert(-1, length - 2, ints - 2), pr1.invert(-1, length - 2, ints - 2)
    )
    [pk_m] = PackedQFloat.multi_invert([pk1], 1, length, 0)
    [pr_m] = PairQFloat.multi_invert([pr1], 1, length, 0)
    assert_same(pk_m, pr_m)


def test_high_precision_true_division(rng):
    """High preset widths: len=40, ints=20 true division (n_digits=60)."""
    pk1, pr1 = rand_qf(rng, length=40, ints=20)
    pk2, pr2 = rand_qf(rng, length=40, ints=20)
    assert_same(pk1 / pk2, pr1 / pr2)
    assert_same(pk1.invert(1, 40, 0), pr1.invert(1, 40, 0))


def test_set_len_ints_parity(rng):
    for newlen, newints in [(30, 9), (18, 5), (23, 12), (23, 3), (40, 20)]:
        pk, pr = rand_qf(rng)
        assert_same(
            pk.copy().set_len_ints(newlen, newints),
            pr.copy().set_len_ints(newlen, newints),
        )


def test_blend_and_abs_neg(rng):
    pk1, pr1 = rand_qf(rng, allow_zero_sign=True)
    pk2, pr2 = rand_qf(rng)
    cond = np.asarray(rng.randint(0, 2, size=64))
    assert_same(pk1.copy().blend_from(pk2, cond), pr1.copy().blend_from(pr2, cond))
    assert_same(abs(pk1), abs(pr1))
    assert_same(-pk1, -pr1)


def test_factories_and_roundtrip(rng):
    pk, pr = rand_qf(rng)
    assert_same(PackedQFloat.zero_like(pk), PairQFloat.zero_like(pr))
    assert_same(PackedQFloat.one_like(pk), PairQFloat.one_like(pr))
    # from_packed/to_packed round trip
    assert_same(pk, PairQFloat.from_packed(pk))
    np.testing.assert_allclose(pk.to_float(), pr.to_float())


def test_div_float_fixup_bound(rng):
    """Exact-division oracle for the float-assisted long division.

    Both float-assisted lowerings (ops.packed._long_division_float and
    pair_math.div_float) use a DOWNWARD-BIASED reciprocal and ONE add-back
    fixup round; this is sound because the bias (2**-17) dominates the f32
    rounding errors, so the floored estimate is never above the true
    quotient digit and (deficit < 2**15 * 2**-16 < 1/2) at most one below
    it.  This test checks both lowerings against Python-int division on
    adversarial inputs sitting exactly ON floor boundaries (v = q*d,
    q*d - 1, q*d + d - 1) plus random draws at the full High-preset widths
    (n_bits=60, divisor < 2**40).
    """
    import jax.numpy as jnp

    from matrix_inversion_tpu.ops import pair_math as pm
    from matrix_inversion_tpu.ops.packed import (
        _float_div_chunk_bits,
        _long_division_float,
    )

    n_bits, divisor_bits = 60, 40
    k = _float_div_chunk_bits(n_bits, divisor_bits)
    assert k == 15

    vmax = (1 << n_bits) - 1
    vs, ds = [], []
    pyrng = np.random.RandomState(7)
    for _ in range(4096):
        d = int(pyrng.randint(1, 1 << 31)) * int(pyrng.randint(1, 1 << 9)) + 1
        d = min(d, (1 << divisor_bits) - 1)
        q = int(pyrng.randint(0, 1 << 20))
        for v in (q * d, q * d - 1, q * d + d - 1):
            if 0 <= v <= vmax:
                vs.append(v)
                ds.append(d)
    # random full-width draws, tiny divisors, zero divisor saturation
    for _ in range(2048):
        vs.append(int(pyrng.randint(0, 1 << 30)) << 30 | int(pyrng.randint(0, 1 << 30)))
        ds.append(int(pyrng.randint(1, 1 << 30)) << int(pyrng.randint(0, 10)) or 1)
    vs += [vmax, vmax, vmax, 0, 1, vmax]
    ds += [1, 2, (1 << divisor_bits) - 1, 5, 1, 0]

    expected = np.array(
        [v // d if d else vmax for v, d in zip(vs, ds)], dtype=np.int64
    )
    v64 = jnp.asarray(np.array(vs, dtype=np.int64))
    d64 = jnp.asarray(np.array(ds, dtype=np.int64))

    got_packed = np.asarray(_long_division_float(v64, d64, n_bits, k))
    np.testing.assert_array_equal(got_packed, expected)

    vhi, vlo = pm.split64(v64)
    dhi, dlo = pm.split64(d64)
    qhi, qlo = pm.div_float(vhi, vlo, dhi, dlo, n_bits, k, d_bits=divisor_bits)
    got_pair = np.asarray(pm.join64(qhi, qlo)).astype(np.int64)
    np.testing.assert_array_equal(got_pair, expected)


@pytest.mark.parametrize("base", [2, 4, 16])
def test_sadd_twos_parity(rng, base):
    """The two's-complement signed-add lowering is bit-identical to the
    default magnitude-select form (set_sadd_impl A/B knob)."""
    try:
        pq.set_sadd_impl("twos")
        for _ in range(4):
            pk1, pr1 = rand_qf(rng, base=base)
            pk2, pr2 = rand_qf(rng, base=base, allow_zero_sign=True)
            assert_same(pk1 + pk2, pr1 + pr2)
            assert_same(pk1 - pk2, pr1 - pr2)
            assert_same(pk2 - pk1, pr2 - pr1)
            assert_same(pk1 + (-2), pr1 + (-2))
            sb = rng.choice([-1, 0, 1], size=64)
            assert_same(
                pk1 + SignedBinary(np.asarray(sb)),
                pr1 + SignedBinary(np.asarray(sb)),
            )
    finally:
        pq.set_sadd_impl("magnitude")
