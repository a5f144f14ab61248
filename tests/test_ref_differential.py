"""Digit-for-digit differential tests against the LIVE reference.

Round-1 verdict item 1: parity was previously proven only against a *port*
of the reference's test vectors.  These tests execute the actual reference
implementation (`/root/reference/matrix_inversion`, loaded clear-mode via
``tests/ref_shim.py``) side by side with this framework on identical random
inputs and assert **digit-for-digit equality** of the internal QFloat state
(digit array + sign) and of whole-inversion circuit outputs.

The framework is batched-first, so each case runs ONE batched framework op
against a loop of scalar reference ops — both the differential check and a
demonstration that the batched semantics are the reference's scalar
semantics.

The only permitted divergences are the two conscious deviations documented
in the framework:

* ``qfloat += Zero()`` — the reference returns bare ``None``
  (reference qfloat.py:803-804, a latent bug); we return ``self``.
* long division for base > 2 — the reference's different-length
  subtraction drops the borrow through the high digits
  (reference base_p_arrays.py:134-135), corrupting some base>2 quotients;
  we compute the exact floor quotient (ops/limbs.py:_subtract_full_width).
  For base 2 the two are digit-identical, which these tests verify; for
  base > 2 we assert our result IS the exact floor quotient.
* ``set_len_ints`` with a shrinking length — the reference slices
  ``array[:-difflen]`` with negative ``difflen`` (reference
  qfloat.py:585-587), keeping the head instead of cropping the tail; the
  path is unreachable from the inversion circuits.  We crop the tail.

Everything else must match the live reference exactly, digit for digit.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import ref_shim

from matrix_inversion_tpu.core.qfloat import QFloat, SignedBinary, Zero
from matrix_inversion_tpu.ops import limbs
from matrix_inversion_tpu.ops.packed import PackedQFloat
from matrix_inversion_tpu.models.inverse import qfloat_matrix_inverse
from matrix_inversion_tpu.models.marshal import float_matrix_to_qfloat_arrays

REF = ref_shim.load_reference()
pytestmark = pytest.mark.skipif(REF is None, reason="reference tree not present")

B = 24  # batch of independent random draws per case


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _ref_states(refs):
    """Stacked (digits, signs) of a list of reference QFloats."""
    digits = np.stack([np.asarray(r._array) for r in refs])
    signs = np.asarray([int(np.asarray(r._sign)) for r in refs], dtype=np.int64)
    return digits, signs


def assert_matches_refs(refs, our, msg=""):
    """Batched framework QFloat == list of scalar reference QFloats."""
    rd, rs = _ref_states(refs)
    od = np.broadcast_to(np.asarray(our.to_digits()), rd.shape)
    os_ = np.broadcast_to(np.asarray(our.sign), rs.shape)
    np.testing.assert_array_equal(od, rd, err_msg=f"digits differ: {msg}")
    np.testing.assert_array_equal(os_, rs, err_msg=f"signs differ: {msg}")


def _batch(rng, length, ints, base, scale=None, nonzero=False):
    """Identical random values as (ref list, limb QFloat, packed QFloat).

    Values are drawn as floats and encoded by the REFERENCE's from_float;
    the framework operands are constructed from the identical digit/sign
    state (from_float parity itself is asserted separately in
    test_from_float_to_float_to_str).
    """
    hi = float(base) ** max(ints - 1, 1)
    if scale is not None:
        hi = min(hi, scale)
    fs = (rng.rand(B) * 2 - 1) * hi
    if nonzero:
        fs = np.where(np.abs(fs) < 0.05 * hi, 0.25 * hi, fs)
    refs = [REF.qf.QFloat.from_float(float(f), length, ints, base) for f in fs]
    digits, signs = _ref_states(refs)
    a = QFloat(jnp.asarray(digits), ints, base, True, jnp.asarray(signs))
    p = PackedQFloat.from_digits(jnp.asarray(digits), ints, base, jnp.asarray(signs))
    return fs, refs, a, p


def _digits_to_int(digits, base):
    """Digit array (MSB first) -> Python int (exact)."""
    v = 0
    for d in np.asarray(digits).tolist():
        v = v * base + int(d)
    return v


CONFIGS = [  # (length, ints, base)
    (32, 16, 2),
    (23, 9, 2),
    (16, 8, 4),
    (10, 5, 16),
]


def test_differential_smoke_core(rng):
    """Core-tier smoke: digit-for-digit diff vs the live reference for the
    hot ops (add/mul/div) at the base-2 Low format, packed backend.  The
    exhaustive per-op and per-config sweeps live in the slow tier below."""
    length, ints, base = 23, 9, 2
    scale = float(base) ** (ints // 2 - 1)
    _, r1, _, p1 = _batch(rng, length, ints, base, scale=scale)
    _, r2, _, p2 = _batch(rng, length, ints, base, scale=scale, nonzero=True)
    assert_matches_refs([x + y for x, y in zip(r1, r2)], p1 + p2, "smoke add")
    assert_matches_refs([x * y for x, y in zip(r1, r2)], p1 * p2, "smoke mul")
    assert_matches_refs([x / y for x, y in zip(r1, r2)], p1 / p2, "smoke div")


# ---------------------------------------------------------------------------
# L1: limb kernels, function-level differential (batched vs looped reference)
# ---------------------------------------------------------------------------

@pytest.mark.slow
class TestLimbKernels:
    @pytest.mark.parametrize("base", [2, 4, 16])
    @pytest.mark.parametrize("la,lb", [(8, 8), (11, 6), (5, 9)])
    def test_addition_subtraction_compare(self, rng, base, la, lb):
        a = rng.randint(0, base, size=(B, la))
        b = rng.randint(0, base, size=(B, lb))
        o_add = np.asarray(limbs.base_p_addition(jnp.asarray(a), jnp.asarray(b), base))
        o_sub = np.asarray(limbs.base_p_subtraction(jnp.asarray(a), jnp.asarray(b), base))
        o_ge = np.asarray(limbs.is_greater_or_equal_base_p(jnp.asarray(a), jnp.asarray(b)))
        for i in range(B):
            np.testing.assert_array_equal(
                o_add[i], REF.bpa.base_p_addition(a[i].copy(), b[i].copy(), base)
            )
            np.testing.assert_array_equal(
                o_sub[i], REF.bpa.base_p_subtraction(a[i].copy(), b[i].copy(), base)
            )
            assert o_ge[i] == REF.bpa.is_greater_or_equal_base_p(a[i].copy(), b[i].copy())
        if la == lb:
            o_eq = np.asarray(limbs.is_equal(jnp.asarray(a), jnp.asarray(b)))
            for i in range(B):
                assert o_eq[i] == REF.bpa.is_equal(a[i].copy(), b[i].copy())

    @pytest.mark.parametrize("ld,lv", [(12, 6), (9, 9), (14, 3)])
    def test_division_base2_digit_identical(self, rng, ld, lv):
        dividend = rng.randint(0, 2, size=(B, ld))
        divisor = rng.randint(0, 2, size=(B, lv))
        o = np.asarray(
            limbs.base_p_division(jnp.asarray(dividend), jnp.asarray(divisor), 2)
        )
        for i in range(B):
            r = REF.bpa.base_p_division(dividend[i].copy(), divisor[i].copy(), 2)
            np.testing.assert_array_equal(o[i], r)

    @pytest.mark.parametrize("base", [4, 16])
    @pytest.mark.parametrize("ld,lv", [(10, 5), (8, 8)])
    def test_division_base_gt2_is_exact_floor(self, rng, base, ld, lv):
        """Our base>2 division is the exact floor quotient; the reference's
        is not always (its different-length subtraction drops the borrow,
        reference base_p_arrays.py:134-135).  Where the reference agrees
        with the exact quotient, we match it digit for digit."""
        dividend = rng.randint(0, base, size=(B, ld))
        divisor = rng.randint(0, base, size=(B, lv))
        divisor[:, -1] = np.maximum(divisor[:, -1], 1)  # avoid zero divisors
        o = np.asarray(
            limbs.base_p_division(jnp.asarray(dividend), jnp.asarray(divisor), base)
        )
        for i in range(B):
            exact = _digits_to_int(dividend[i], base) // _digits_to_int(divisor[i], base)
            assert _digits_to_int(o[i], base) == exact, "our quotient must be exact"
            r = REF.bpa.base_p_division(dividend[i].copy(), divisor[i].copy(), base)
            if _digits_to_int(r, base) == exact:
                np.testing.assert_array_equal(o[i], r)


# ---------------------------------------------------------------------------
# L2: QFloat operator-level differential (both backends vs live reference)
# ---------------------------------------------------------------------------

@pytest.mark.slow
class TestQFloatOps:
    @pytest.mark.parametrize("length,ints,base", CONFIGS)
    def test_from_float_to_float_to_str(self, rng, length, ints, base):
        for _ in range(8):
            f = float((rng.rand() * 2 - 1) * base ** max(ints - 1, 1))
            r = REF.qf.QFloat.from_float(f, length, ints, base)
            a = QFloat.from_float(f, length, ints, base)
            p = PackedQFloat.from_float(f, length, ints, base)
            rd, rs = _ref_states([r])
            np.testing.assert_array_equal(np.asarray(a.to_digits()), rd[0])
            np.testing.assert_array_equal(np.asarray(p.to_digits()), rd[0])
            assert int(np.asarray(a.sign)) == rs[0]
            assert int(np.asarray(p.sign)) == rs[0]
            assert a.to_float() == r.to_float()
            assert a.to_str() == r.to_str()
            assert p.to_str() == r.to_str()

    @pytest.mark.parametrize("length,ints,base", CONFIGS)
    def test_add_sub_neg_abs(self, rng, length, ints, base):
        _, r1, a1, p1 = _batch(rng, length, ints, base, scale=100.0)
        _, r2, a2, p2 = _batch(rng, length, ints, base, scale=100.0)
        assert_matches_refs([x + y for x, y in zip(r1, r2)], a1 + a2, "add")
        assert_matches_refs([x + y for x, y in zip(r1, r2)], p1 + p2, "packed add")
        assert_matches_refs([x - y for x, y in zip(r1, r2)], a1 - a2, "sub")
        assert_matches_refs([x - y for x, y in zip(r1, r2)], p1 - p2, "packed sub")
        assert_matches_refs([-x for x in r1], -a1, "neg")
        assert_matches_refs([abs(x) for x in r1], abs(a1), "abs")
        assert_matches_refs([abs(x) for x in r1], abs(p1), "packed abs")

    @pytest.mark.parametrize("length,ints,base", CONFIGS)
    def test_iadd_scalar_and_signedbinary(self, rng, length, ints, base):
        ks = rng.randint(-3, 4, size=B)
        _, r, a, p = _batch(rng, length, ints, base, scale=50.0)
        for x, k in zip(r, ks):
            x += int(k)
        a += jnp.asarray(ks)
        p += jnp.asarray(ks)
        assert_matches_refs(r, a, "iadd int")
        assert_matches_refs(r, p, "packed iadd int")

        sbs = rng.randint(-1, 2, size=B)
        _, r2, a2, p2 = _batch(rng, length, ints, base, scale=50.0)
        for i, x in enumerate(r2):
            x += REF.qf.SignedBinary(int(sbs[i]))
            r2[i] = x
        a2 += SignedBinary(jnp.asarray(sbs))
        p2 += SignedBinary(jnp.asarray(sbs))
        assert_matches_refs(r2, a2, "iadd SignedBinary")
        assert_matches_refs(r2, p2, "packed iadd SignedBinary")

    def test_iadd_zero_is_the_documented_deviation(self):
        """reference `q += Zero()` destroys q (returns None); we keep q."""
        r = REF.qf.QFloat.from_float(2.5, 16, 8, 2)
        r += REF.qf.Zero()
        assert r is None  # the reference bug, still present
        a = QFloat.from_float(2.5, 16, 8, 2)
        a += Zero()
        assert isinstance(a, QFloat) and a.to_float() == 2.5
        p = PackedQFloat.from_float(2.5, 16, 8, 2)
        p += Zero()
        assert isinstance(p, PackedQFloat) and p.to_float() == 2.5

    @pytest.mark.parametrize("length,ints,base", CONFIGS)
    def test_mul(self, rng, length, ints, base):
        # keep |f1*f2| within the integer range to avoid overflow noise
        scale = float(base) ** (ints // 2 - 1) if ints >= 4 else 1.5
        _, r1, a1, p1 = _batch(rng, length, ints, base, scale=scale)
        _, r2, a2, p2 = _batch(rng, length, ints, base, scale=scale)
        assert_matches_refs([x * y for x, y in zip(r1, r2)], a1 * a2, "mul")
        assert_matches_refs([x * y for x, y in zip(r1, r2)], p1 * p2, "packed mul")
        ks = rng.randint(-2, 3, size=B)
        assert_matches_refs(
            [x * int(k) for x, k in zip(r1, ks)], a1 * jnp.asarray(ks), "mul int"
        )
        sbs = rng.randint(-1, 2, size=B)
        assert_matches_refs(
            [x * REF.qf.SignedBinary(int(s)) for x, s in zip(r1, sbs)],
            a1 * SignedBinary(jnp.asarray(sbs)),
            "mul SignedBinary",
        )
        assert_matches_refs(
            [x * REF.qf.SignedBinary(int(s)) for x, s in zip(r1, sbs)],
            p1 * SignedBinary(jnp.asarray(sbs)),
            "packed mul SignedBinary",
        )

    @pytest.mark.parametrize("length,ints,base", CONFIGS)
    @pytest.mark.parametrize("fmt", ["wide", "narrow", "allint"])
    def test_from_mul_formats(self, rng, length, ints, base, fmt):
        newlen, newints = {
            "wide": (length + 4, ints + 2),
            "narrow": (max(4, length // 2), max(2, ints // 2)),
            "allint": (length, length),
        }[fmt]
        scale = float(base) ** (ints // 2 - 1) if ints >= 4 else 1.5
        _, r1, a1, p1 = _batch(rng, length, ints, base, scale=scale)
        _, r2, a2, p2 = _batch(rng, length, ints, base, scale=scale)
        rr = [REF.qf.QFloat.from_mul(x, y, newlen, newints) for x, y in zip(r1, r2)]
        assert_matches_refs(rr, QFloat.from_mul(a1, a2, newlen, newints), fmt)
        assert_matches_refs(rr, PackedQFloat.from_mul(p1, p2, newlen, newints), f"packed {fmt}")

    def test_from_mul_reference_crop_corner(self, rng):
        """The reference test's cross-format crop case
        (reference tests/test_qfloat.py:108-143): (18,18) x (25,0) -> (18,1)."""
        f1s = rng.randint(1, 2 ** 15, size=B).astype(np.float64)
        f2s = rng.rand(B) * 0.999
        r1 = [REF.qf.QFloat.from_float(float(f), 18, 18, 2) for f in f1s]
        r2 = [REF.qf.QFloat.from_float(float(f), 25, 0, 2) for f in f2s]
        d1, s1 = _ref_states(r1)
        d2, s2 = _ref_states(r2)
        a1 = QFloat(jnp.asarray(d1), 18, 2, True, jnp.asarray(s1))
        a2 = QFloat(jnp.asarray(d2), 0, 2, True, jnp.asarray(s2))
        p1 = PackedQFloat.from_digits(jnp.asarray(d1), 18, 2, jnp.asarray(s1))
        p2 = PackedQFloat.from_digits(jnp.asarray(d2), 0, 2, jnp.asarray(s2))
        rr = [REF.qf.QFloat.from_mul(x, y, 18, 1) for x, y in zip(r1, r2)]
        assert_matches_refs(rr, QFloat.from_mul(a1, a2, 18, 1), "crop corner")
        assert_matches_refs(rr, PackedQFloat.from_mul(p1, p2, 18, 1), "crop packed")

    @pytest.mark.parametrize("length,ints", [(32, 16), (23, 9)])
    @pytest.mark.parametrize("fmt", [(None, None), (20, 6), (12, 0)])
    def test_truediv_and_invert_base2(self, rng, length, ints, fmt):
        base = 2
        _, r1, a1, p1 = _batch(rng, length, ints, base, scale=100.0)
        _, r2, a2, p2 = _batch(rng, length, ints, base, scale=100.0, nonzero=True)
        if fmt == (None, None):
            rr = [x / y for x, y in zip(r1, r2)]
            assert_matches_refs(rr, a1 / a2, "truediv")
            assert_matches_refs(rr, p1 / p2, "packed truediv")
            # 1/x: both sides only accept SignedBinary numerators
            # (reference qfloat.py:1244-1261 raises on plain ints)
            rr = [REF.qf.SignedBinary(1) / y for y in r2]
            assert_matches_refs(rr, SignedBinary(1) / a2, "SB(1)/x")
            assert_matches_refs(rr, SignedBinary(1) / p2, "packed SB(1)/x")
        else:
            newlen, newints = fmt
            rr = [y.copy().invert(1, newlen, newints) for y in r2]
            assert_matches_refs(rr, a2.copy().invert(1, newlen, newints), "invert")
            assert_matches_refs(rr, p2.copy().invert(1, newlen, newints), "packed invert")

    def test_divide_by_zero_saturates(self):
        """x / SignedBinary(0) saturates to all (base-1) digits on both sides
        (reference qfloat.py:1199-1210)."""
        for base, length, ints in [(2, 16, 8), (4, 10, 5)]:
            r = REF.qf.QFloat.from_float(3.5, length, ints, base)
            a = QFloat.from_float(3.5, length, ints, base)
            p = PackedQFloat.from_float(3.5, length, ints, base)
            rr = r / REF.qf.SignedBinary(0)
            assert_matches_refs([rr], a / SignedBinary(0), "div by SB(0)")
            assert_matches_refs([rr], p / SignedBinary(0), "packed div by SB(0)")

    @pytest.mark.parametrize("length,ints,base", CONFIGS)
    def test_comparisons(self, rng, length, ints, base):
        _, r1, a1, p1 = _batch(rng, length, ints, base, scale=30.0)
        _, r2, a2, p2 = _batch(rng, length, ints, base, scale=30.0)
        # make some pairs equal to exercise the equality paths
        for i in range(0, B, 3):
            r2[i] = r1[i].copy()
        d1, s1 = _ref_states(r1)
        d2, s2 = _ref_states(r2)
        a1 = QFloat(jnp.asarray(d1), ints, base, True, jnp.asarray(s1))
        a2 = QFloat(jnp.asarray(d2), ints, base, True, jnp.asarray(s2))
        p1 = PackedQFloat.from_digits(jnp.asarray(d1), ints, base, jnp.asarray(s1))
        p2 = PackedQFloat.from_digits(jnp.asarray(d2), ints, base, jnp.asarray(s2))
        for op in ("__gt__", "__ge__", "__lt__", "__le__", "__eq__"):
            rv = np.asarray([int(np.asarray(getattr(x, op)(y))) for x, y in zip(r1, r2)])
            av = np.asarray(getattr(a1, op)(a2))
            pv = np.asarray(getattr(p1, op)(p2))
            np.testing.assert_array_equal(av, rv, err_msg=op)
            np.testing.assert_array_equal(pv, rv, err_msg=f"packed {op}")

    @pytest.mark.parametrize("base", [2, 4, 16])
    def test_tidy_mixed_sign_arrays(self, rng, base):
        """tidy() on deliberately untidy mixed-sign digit arrays
        (mirrors reference tests/test_qfloat.py:191-213, but diffed against
        the live reference instead of a port)."""
        length, ints = 12, 6
        arrs = rng.randint(-(base - 1), base, size=(B, length))
        refs = []
        for i in range(B):
            r = REF.qf.QFloat(arrs[i].astype(np.int64).copy(), ints, base, False, 1)
            r.tidy()
            refs.append(r)
        a = QFloat(jnp.asarray(arrs), ints, base, False, 1)
        a.tidy()
        assert_matches_refs(refs, a, "tidy")

    @pytest.mark.parametrize("length,ints,base", CONFIGS)
    @pytest.mark.parametrize("fmt", [("grow", 6), ("shift", 0)])
    def test_set_len_ints(self, rng, length, ints, base, fmt):
        _, delta = fmt
        newlen = max(4, length + delta)
        newints = max(1, min(newlen, ints + delta // 2))
        _, r, a, p = _batch(rng, length, ints, base, scale=20.0)
        for x in r:
            x.set_len_ints(newlen, newints)
        a.set_len_ints(newlen, newints)
        p.set_len_ints(newlen, newints)
        assert_matches_refs(r, a, f"set_len_ints({newlen},{newints})")
        assert_matches_refs(r, p, f"packed set_len_ints({newlen},{newints})")

    @pytest.mark.parametrize("length,ints,base", CONFIGS)
    def test_set_len_ints_shrink_is_the_documented_deviation(self, rng, length, ints, base):
        """Conscious deviation #3: the reference's length-shrink branch
        slices ``array[:-difflen]`` with NEGATIVE ``difflen`` (reference
        qfloat.py:585-587), keeping the first ``-difflen`` digits instead
        of dropping the trailing ones — a latent bug, unreachable from the
        inversion circuits (the only circuit callers pass
        ``newlength=None`` => difflen == 0: qfloat.py:979, 1107 via
        multi_from_mul(None, None)).  We crop the *trailing* digits (the
        intended, value-preserving semantics).  This test pins both
        behaviors so any reference change is noticed."""
        newlen, newints = length - 4, max(1, ints - 2)
        _, r, a, p = _batch(rng, length, ints, base, scale=20.0)
        pre_digits, _ = _ref_states(r)
        for x in r:
            x.set_len_ints(newlen, newints)
        a.set_len_ints(newlen, newints)
        p.set_len_ints(newlen, newints)
        # intended semantics: drop (ints-newints) leading, keep first newlen
        expected = pre_digits[:, ints - newints :][:, :newlen]
        np.testing.assert_array_equal(np.asarray(a.to_digits()), expected)
        np.testing.assert_array_equal(np.asarray(p.to_digits()), expected)
        # the reference bug: keeps the first -difflen digits instead
        difflen = newlen - (length - (ints - newints))
        buggy = pre_digits[:, ints - newints :][:, : -difflen]
        rd, _ = _ref_states(r)
        np.testing.assert_array_equal(rd, buggy)


# ---------------------------------------------------------------------------
# L3/L4: whole-circuit differential (digit-for-digit on the output arrays)
# ---------------------------------------------------------------------------

PRESETS = {
    "low": (23, 9, False),
    "medium": (31, 16, False),
    "medium+": (31, 16, True),
    "high": (40, 20, True),
}


def _ref_inverse_batch(Ms, qlen, qints, base, true_division):
    outs = []
    for M in Ms:
        arrays, signs = REF.qmi.float_matrix_to_qfloat_arrays(M, qlen, qints, base)
        out = REF.qmi.qfloat_matrix_inverse(
            arrays, signs, M.shape[0], qlen, qints, base, true_division
        )
        outs.append(np.asarray(out))
    return np.stack(outs)


def _our_inverse_batch(Ms, qlen, qints, base, true_division, lowering, backend="packed"):
    n = Ms.shape[-1]
    digits, signs = float_matrix_to_qfloat_arrays(Ms, qlen, qints, base)
    fn = jax.jit(
        lambda d, s: qfloat_matrix_inverse(
            d, s, n, qlen, qints, base, true_division,
            backend=backend, lowering=lowering,
        )
    )
    return np.asarray(fn(jnp.asarray(digits), jnp.asarray(signs)))


def _diff_inverse(rng, n, preset, batch, lowering, backend="packed"):
    qlen, qints, true_division = PRESETS[preset]
    Ms = rng.randn(batch, n, n) * 100
    ref_out = _ref_inverse_batch(Ms, qlen, qints, 2, true_division)
    our_out = _our_inverse_batch(Ms, qlen, qints, 2, true_division, lowering, backend)
    np.testing.assert_array_equal(
        our_out,
        ref_out,
        err_msg=f"inverse digits differ: n={n} {preset} {lowering} {backend}",
    )


class TestWholeInverseDifferential:
    """Digit-for-digit equality of the full circuit output vs the live
    reference, base 2, identical random matrices (normal(0,100) sampler,
    the reference's benchmark distribution)."""

    def test_n2_low_unroll(self, rng):
        _diff_inverse(rng, 2, "low", 16, "unroll")

    @pytest.mark.slow
    def test_n2_high_unroll(self, rng):
        _diff_inverse(rng, 2, "high", 16, "unroll")

    @pytest.mark.slow
    def test_n3_low_unroll(self, rng):
        # ties scan-lowering transitivity to a direct unrolled-object diff
        _diff_inverse(rng, 3, "low", 8, "unroll")

    @pytest.mark.slow
    def test_n3_high_scan(self, rng):
        _diff_inverse(rng, 3, "high", 16, "scan")

    @pytest.mark.slow
    def test_n4_high_scan(self, rng):
        _diff_inverse(rng, 4, "high", 16, "scan")

    @pytest.mark.slow
    def test_n2_low_limb_backend(self, rng):
        _diff_inverse(rng, 2, "low", 4, "unroll", backend="limb")

    @pytest.mark.slow
    def test_n3_low_limb_backend(self, rng):
        _diff_inverse(rng, 3, "low", 2, "unroll", backend="limb")

    @pytest.mark.slow
    @pytest.mark.parametrize("preset", ["low", "medium", "medium+", "high"])
    @pytest.mark.parametrize("n", [3, 4, 5])
    def test_all_presets_scan(self, rng, n, preset):
        _diff_inverse(rng, n, preset, 8, "scan")

    @pytest.mark.slow
    @pytest.mark.parametrize("preset", ["low", "medium", "medium+", "high"])
    def test_n2_all_presets(self, rng, preset):
        _diff_inverse(rng, 2, preset, 16, "unroll")

    @pytest.mark.slow
    @pytest.mark.parametrize("n", [3, 4, 5])
    def test_vec_lowering_high(self, rng, n):
        qlen, qints, td = PRESETS["high"]
        Ms = rng.randn(8, n, n) * 100
        ref_out = _ref_inverse_batch(Ms, qlen, qints, 2, td)
        our_out = _our_inverse_batch(Ms, qlen, qints, 2, td, "vec")
        np.testing.assert_array_equal(our_out, ref_out)


class TestPartialCircuitsDifferential:
    """Pivot / L / U partial circuits vs the live reference (n=3, Low)."""

    def _arrays(self, rng, n, qlen, qints):
        M = rng.randn(n, n) * 100
        return REF.qmi.float_matrix_to_qfloat_arrays(M, qlen, qints, 2)

    def test_pivot(self, rng):
        from matrix_inversion_tpu.models.inverse import qfloat_pivot

        n, qlen, qints = 3, 23, 9
        for _ in range(5):
            arrays, signs = self._arrays(rng, n, qlen, qints)
            # the reference's qfloat_pivot takes a 5-element params list
            # (qfloat_matrix_inversion.py:596)
            ref_P = np.asarray(
                REF.qmi.qfloat_pivot(arrays, signs, [n, qlen, qints, 2, False])
            )
            our_P = np.asarray(
                qfloat_pivot(
                    jnp.asarray(arrays), jnp.asarray(signs),
                    [n, qlen, qints, 2, False, False], backend="packed",
                )
            )
            np.testing.assert_array_equal(our_P, ref_P)

    @pytest.mark.slow
    def test_lu_L_and_U(self, rng):
        from matrix_inversion_tpu.models.inverse import qfloat_lu_L, qfloat_lu_U

        n, qlen, qints = 3, 23, 9
        params = [n, qlen, qints, 2, False, False]
        arrays, signs = self._arrays(rng, n, qlen, qints)
        ref_L = np.asarray(REF.qmi.qfloat_lu_L(arrays, signs, params))
        ref_U = np.asarray(REF.qmi.qfloat_lu_U(arrays, signs, params))
        our_L = np.asarray(
            qfloat_lu_L(jnp.asarray(arrays), jnp.asarray(signs), params, backend="packed")
        )
        our_U = np.asarray(
            qfloat_lu_U(jnp.asarray(arrays), jnp.asarray(signs), params, backend="packed")
        )
        np.testing.assert_array_equal(our_L, ref_L)
        np.testing.assert_array_equal(our_U, ref_U)


class TestBaseGt2Inverse:
    """Whole inversions at base 4/16: the conscious division deviation means
    digit equality is not guaranteed, but our result must be at least as
    close to the float oracle as the reference's."""

    @pytest.mark.slow
    @pytest.mark.parametrize("base,qlen,qints", [(4, 16, 8), (16, 8, 4)])
    def test_n2_float_parity_or_better(self, rng, base, qlen, qints):
        from matrix_inversion_tpu.models.marshal import (
            qfloat_and_signs_arrays_to_float_matrix,
        )

        worse = 0
        for _ in range(6):
            M = rng.randn(2, 2) * 10 + np.eye(2) * 20
            ref_out = _ref_inverse_batch(M[None], qlen, qints, base, True)[0]
            our_out = _our_inverse_batch(M[None], qlen, qints, base, True, "unroll", "limb")[0]
            exact = np.linalg.inv(M)
            ref_f = np.asarray(
                REF.qmi.qfloat_and_signs_arrays_to_float_matrix(ref_out, qints, base)
            )
            our_f = qfloat_and_signs_arrays_to_float_matrix(our_out, qints, base)
            if np.max(np.abs(our_f - exact)) > np.max(np.abs(ref_f - exact)) + 1e-9:
                worse += 1
        assert worse == 0, "base>2 inversion must be parity-or-better vs reference"
