"""QFloat / SignedBinary / Zero number types, natively batched for TPU.

Re-design of the reference number stack (reference
matrix_inversion/qfloat.py) with the same numeric semantics:

* a QFloat is a base-p digit array (most-significant first) split into
  ``ints`` integer digits and ``len - ints`` fraction digits, plus a
  separate sign in {-1, 0, +1} (sign 0 makes the value behave as zero,
  reference qfloat.py:299);
* ``Zero`` and ``SignedBinary`` are *static type-level* fast paths that
  prune work at trace time (reference qfloat.py:14-242) — in JAX terms they
  are Python-level dispatch that keeps the pruning out of the compiled
  graph;
* every operation broadcasts over leading batch dimensions, so one QFloat
  object transparently represents a whole batch of scalars (the
  reference's ``multi_*``/tensorize machinery, qfloat.py:1023-1376, is the
  default execution model here).

Differences from the reference, made consciously:

* ``__iadd__`` with a ``Zero`` returns ``self`` unchanged instead of the
  reference's bare ``None`` (reference qfloat.py:803-804 — a latent bug
  that would destroy the variable);
* clear/encrypted promotion ("check_convert_fhe", reference
  qfloat.py:780-796) is a no-op: jnp transparently mixes host and device
  operands, and under ``jit`` everything is traced anyway.
"""

from __future__ import annotations

import numbers

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import limbs
from ..ops import radix

Array = (jax.Array, np.ndarray)


def _is_number_like(x) -> bool:
    """Scalar/batched plain-number operand (reference: Tracer or Integral)."""
    return isinstance(x, numbers.Integral) or isinstance(x, Array)


def _sign_of(x):
    if isinstance(x, numbers.Number):
        return int(np.sign(x))
    return jnp.sign(x)


def _dfac(x):
    """Broadcast a batched scalar factor against a digit axis."""
    if isinstance(x, Array) and jnp.ndim(x) > 0:
        return x[..., None]
    return x


class Zero:
    """Compile-time-known zero; absorbs ops without emitting device work.

    Mirrors reference qfloat.py:14-117.
    """

    def copy(self):
        return self

    def to_float(self):
        return float(0)

    def __add__(self, other):
        return self if isinstance(other, Zero) else other

    def __radd__(self, other):
        return self if isinstance(other, Zero) else other

    def __sub__(self, other):
        return self if isinstance(other, Zero) else -other

    def __rsub__(self, other):
        return other

    def __mul__(self, other):
        return self

    def __rmul__(self, other):
        return self

    def __truediv__(self, other):
        if isinstance(other, Zero):
            raise ValueError("division by Zero")
        return self

    def __rtruediv__(self, other):
        raise ValueError("division by Zero")

    def __neg__(self):
        return self

    def neg(self):
        return self

    def __abs__(self):
        return self


class SignedBinary:
    """A value known to be in {-1, 0, +1} (scalar or batched array).

    Mirrors reference qfloat.py:120-242.  Cheap to multiply with (a sign
    flip) and to add (a unit-digit add).
    """

    def __init__(self, value):
        self._value = value

    @property
    def value(self):
        return self._value

    @value.setter
    def value(self, newvalue):
        self._value = newvalue

    @property
    def encrypted(self):
        return isinstance(self._value, jax.Array)

    def copy(self):
        return SignedBinary(self._value)

    def to_float(self):
        v = self._value
        if isinstance(v, Array):
            return np.asarray(v).astype(float)
        return float(v)

    def __add__(self, other):
        if isinstance(other, SignedBinary):
            return self._value + other._value  # potentially no longer binary
        if isinstance(other, QFloatBase):
            return other.__add__(self)
        return self._value + other

    def __sub__(self, other):
        if isinstance(other, SignedBinary):
            return self._value - other._value
        if isinstance(other, QFloatBase):
            return other.__rsub__(self)
        return self._value - other

    def __mul__(self, other):
        if isinstance(other, SignedBinary):
            return SignedBinary(self._value * other._value)
        if isinstance(other, QFloatBase):
            return other.__mul__(self)
        return self._value * other

    def __truediv__(self, other):
        if isinstance(other, SignedBinary):
            return SignedBinary(self._value // other._value)
        if isinstance(other, QFloatBase):
            return other.__rtruediv__(self)
        return self._value / other

    def __neg__(self):
        return SignedBinary(-1 * self._value)

    def neg(self):
        self._value = self._value * -1
        return self

    def __abs__(self):
        if isinstance(self._value, Array):
            return SignedBinary(jnp.abs(self._value))
        return SignedBinary(np.abs(self._value))


class QFloatBase:
    """Common interface + derived operators shared by both backends.

    Concrete backends: :class:`QFloat` (digit arrays, any base) and
    :class:`matrix_inversion_tpu.ops.packed.PackedQFloat` (int64 fast path).
    """

    # Trace-time op statistics (reference qfloat.py:262-265).
    ADDITIONS = 0
    MULTIPLICATION = 0
    DIVISION = 0

    _ints: int
    _base: int

    @classmethod
    def reset_stats(cls):
        QFloatBase.ADDITIONS = 0
        QFloatBase.MULTIPLICATION = 0
        QFloatBase.DIVISION = 0

    @classmethod
    def show_stats(cls):
        print("\nQFloat statistics :")
        print("======================")
        print("Additions       : " + str(QFloatBase.ADDITIONS))
        print("Multiplications : " + str(QFloatBase.MULTIPLICATION))
        print("Divisions       : " + str(QFloatBase.DIVISION))
        print("\n")

    # ---- static metadata --------------------------------------------------
    @property
    def ints(self):
        return self._ints

    @property
    def base(self):
        return self._base

    @property
    def sign(self):
        return self._sign

    @property
    def frac(self):
        return len(self) - self._ints

    # ---- derived operators (reference qfloat.py:692-778, 836-953) ---------
    def __add__(self, other):
        addition = self.copy()
        addition += other
        return addition

    def __radd__(self, other):
        return self.__add__(other)

    def __sub__(self, other):
        res = -other
        res += self
        return res

    def __rsub__(self, other):
        res = -self
        res += other
        return res

    def __mul__(self, other):
        if isinstance(other, Zero):
            return Zero()
        multiplication = self.copy()
        multiplication *= other
        return multiplication

    def __rmul__(self, other):
        return self.__mul__(other)

    def __truediv__(self, other):
        division = self.copy()
        division /= other
        return division

    def __rtruediv__(self, other):
        if isinstance(other, Zero):
            return Zero()
        if isinstance(other, SignedBinary):
            # the value is also its sign (reference qfloat.py:1252-1256)
            return self.invert(other.value, len(self), self._ints)
        if isinstance(other, QFloatBase):
            return other / self
        raise ValueError("Unknown class for other")

    def __neg__(self):
        neg = self.copy()
        neg._sign = neg._sign * -1
        return neg

    def neg(self):
        self._sign = self._sign * -1
        return self

    def __abs__(self):
        absval = self.copy()
        absval._sign = absval._sign * absval._sign  # stays 0 if 0
        return absval

    def abs(self):
        self._sign = self._sign * self._sign
        return self

    def __lt__(self, other):
        return other > self

    def __le__(self, other):
        return 1 - (self > other)

    def __ge__(self, other):
        return 1 - (other > self)

    @classmethod
    def check_convert_fhe(cls, qfloat, condition):
        """No-op kept for API parity (reference qfloat.py:780-789).

        jnp transparently mixes host and device operands, so clear->
        encrypted promotion has no TPU analog.  (The reference version
        would crash anyway: it assigns through always-raising property
        setters — see SURVEY.md 2.3.)
        """
        return None

    def self_check_convert_fhe(self, condition):
        """No-op kept for API parity (reference qfloat.py:791-796)."""
        return None

    def check_compatibility(self, other):
        """Reference qfloat.py:591-605."""
        if not isinstance(other, QFloatBase):
            raise ValueError("Object must also be a QFloat")
        if self._base != other.base:
            raise ValueError("QFloats bases are different")
        if len(self) != len(other):
            raise ValueError("QFloats have different length")
        if self._ints != other.ints:
            raise ValueError("QFloats have different dot index")


class QFloat(QFloatBase):
    """Digit-array QFloat backend (any base), batched over leading dims.

    Storage: ``_array`` int32[..., L] (most-significant digit first),
    ``_sign`` int scalar or [...] array, static ``_ints``/``_base`` and the
    ``_is_base_tidy`` deferred-normalization flag (reference
    qfloat.py:267-305).
    """

    def __init__(self, array, ints=None, base=2, is_base_tidy=True, sign=1):
        if not isinstance(array, Array):
            raise ValueError("array must be a numpy or jax array")
        array = jnp.asarray(array, dtype=limbs.DIGIT_DTYPE)
        if array.ndim < 1:
            raise ValueError("array must have a digit axis")
        self._array = array

        if not (isinstance(base, int) and base > 1):
            raise ValueError("base must be a int >1")
        self._base = base

        length = array.shape[-1]
        if ints is None:
            ints = length // 2
        elif not (isinstance(ints, (int, np.integer)) and 0 <= ints <= length):
            raise ValueError("ints must be in range [0,array length]")
        self._ints = int(ints)

        if isinstance(sign, float):
            sign = int(sign)
        self._sign = sign

        self._is_base_tidy = is_base_tidy
        if not self._is_base_tidy:
            self.base_tidy()

    # ---- shape ------------------------------------------------------------
    def __len__(self):
        return int(self._array.shape[-1])

    @property
    def bshape(self):
        """Leading batch shape."""
        return self._array.shape[:-1]

    @property
    def array(self):
        return self._array

    @property
    def is_base_tidy(self):
        return self._is_base_tidy

    @property
    def encrypted(self):
        # API-parity only: "encrypted" means device/traced in this build.
        return isinstance(self._array, jax.Array)

    # ---- host conversions (reference qfloat.py:336-410) -------------------
    @classmethod
    def from_float(cls, f, length=10, ints=None, base=2):
        if ints is None:
            ints = length // 2
        digits, sign = radix.float_to_digits_and_sign(f, length, ints, base)
        if np.ndim(sign) == 0:
            sign = int(sign)
        return cls(digits, ints, base, True, sign)

    def to_float(self):
        return radix.digits_and_sign_to_float(
            np.asarray(self._array), np.asarray(self._sign), self._ints, self._base
        )

    def to_str(self, tidy=True):
        """Reference qfloat.py:336-365 (unbatched only)."""
        if self.bshape != ():
            raise ValueError("to_str works on unbatched QFloats only")
        if tidy:
            self.base_tidy()
        sgn = int(np.asarray(self._sign))
        arr = np.asarray(self._array) * (sgn != 0)
        integer_part = arr[: self._ints].astype(int)
        float_part = arr[self._ints :].astype(int)
        if self._base <= 10:
            integer_part = "".join(str(i) for i in integer_part)
            float_part = "".join(str(i) for i in float_part)
        else:
            integer_part = str(integer_part)
            float_part = str(float_part)
        sgnstr = "" if sgn >= 0 else "-"
        return sgnstr + integer_part + "." + float_part

    def __str__(self):
        return self.to_str(True)

    # ---- factories (reference qfloat.py:502-546) --------------------------
    @classmethod
    def zero(cls, length, ints, base, bshape=()):
        return cls(jnp.zeros(bshape + (length,), limbs.DIGIT_DTYPE), ints, base, True, 1)

    @classmethod
    def zero_like(cls, other):
        return cls.zero(len(other), other.ints, other.base, other.bshape)

    @classmethod
    def one(cls, length, ints, base, bshape=()):
        arr = jnp.zeros(bshape + (length,), limbs.DIGIT_DTYPE)
        arr = arr.at[..., ints - 1].set(1)
        return cls(arr, ints, base, True, 1)

    @classmethod
    def one_like(cls, other):
        return cls.one(len(other), other.ints, other.base, other.bshape)

    def copy(self):
        return QFloat(self._array, self._ints, self._base, self._is_base_tidy, self._sign)

    def to_array(self):
        return self._array

    def to_digits(self):
        """Uniform digit accessor shared with the packed backend."""
        return self._array

    def set_len_ints(self, newlen, newints):
        """Resize/crop the encoding (reference qfloat.py:565-589)."""
        arr = self._array
        if self._ints != newints:
            if newints > self._ints:
                pad = jnp.zeros(arr.shape[:-1] + (int(newints - self._ints),), arr.dtype)
                arr = jnp.concatenate([pad, arr], axis=-1)
            else:
                arr = arr[..., self._ints - newints :]
            self._ints = int(newints)
        difflen = int(newlen) - arr.shape[-1]
        if difflen != 0:
            if difflen > 0:
                pad = jnp.zeros(arr.shape[:-1] + (difflen,), arr.dtype)
                arr = jnp.concatenate([arr, pad], axis=-1)
            else:
                arr = arr[..., :difflen]
        self._array = arr
        return self

    # ---- normalization (reference qfloat.py:607-673) ----------------------
    def base_tidy(self):
        if self._is_base_tidy:
            return
        self._array = limbs.base_tidy(self._array, self._base)
        self._is_base_tidy = True

    @classmethod
    def multi_base_tidy(cls, arrays, base):
        return limbs.base_tidy(arrays, base)

    def tidy(self):
        if not self._is_base_tidy:
            self.base_tidy()
        mag, sign = limbs.tidy_to_sign_mag(self._array, self._base)
        self._array = mag
        self._sign = sign

    # ---- comparisons (reference qfloat.py:681-749) ------------------------
    def __eq__(self, other):
        self.check_compatibility(other)
        if not (self._is_base_tidy and other._is_base_tidy):
            raise Exception("cannot compare QFloats that are not tidy")
        return limbs.is_equal(self._array, other._array) * (
            self._sign == other._sign
        )

    __hash__ = None

    def __gt__(self, other):
        self.check_compatibility(other)
        self.base_tidy()
        other.base_tidy()
        sgn_eq = (self._sign == other._sign) * 1
        self_gt_other = 1 - limbs.is_greater_or_equal(other._array, self._array)
        inverse = ((self._sign < 0) * 1) * (
            1 - limbs.is_equal(self._array, other._array)
        )
        return sgn_eq * (self_gt_other ^ inverse) + (1 - sgn_eq) * (
            (self._sign > other._sign) * 1
        )

    # ---- addition (reference qfloat.py:798-834) ---------------------------
    def __iadd__(self, other):
        if isinstance(other, Zero):
            return self  # (reference returns None here — latent bug, fixed)

        QFloatBase.ADDITIONS += 1

        arr = self._array * _dfac(self._sign)  # becomes 0 if sign is 0
        if isinstance(other, SignedBinary):
            arr = arr.at[..., self._ints - 1].add(other.value)
        elif _is_number_like(other):
            arr = arr.at[..., self._ints - 1].add(other)
        else:
            self.check_compatibility(other)
            arr = arr + other._array * _dfac(other._sign)
        self._array = arr
        self._is_base_tidy = False
        self._sign = None
        self.base_tidy()
        mag, sign = limbs.tidy_to_sign_mag(self._array, self._base)
        self._array = mag
        self._sign = sign
        return self

    # ---- multiplication (reference qfloat.py:852-930, 955-1181) -----------
    def __imul__(self, other):
        if _is_number_like(other):
            sign = _sign_of(other)
            self._array = self._array * _dfac(other * sign)
            self._sign = self._sign * sign
            self._is_base_tidy = False
            self.base_tidy()
        elif isinstance(other, SignedBinary):
            # multiplying by a binary is a sign multiply (reference :867-871)
            self._sign = self._sign * other.value
        else:
            QFloatBase.MULTIPLICATION += 1
            self.base_tidy()
            other.base_tidy()
            self.check_compatibility(other)
            cols = _mul_window(
                self._array,
                self._ints,
                other._array,
                other.ints,
                len(self),
                self._ints,
            )
            self._array = cols
            self._sign = self._sign * other._sign
            self._is_base_tidy = False
            self.base_tidy()
        return self

    @classmethod
    def from_mul(cls, a, b, newlength=None, newints=None):
        """Windowed multiply into a chosen output format.

        Digit-exact with reference qfloat.py:955-1021 including the
        per-partial-product cropping (sub-window digits of each partial
        product are dropped *before* summation, so this is intentionally
        not a pure value function of (a, b)).
        """
        if newlength is None:
            newlength = len(a)
        if newints is None:
            newints = a.ints

        if isinstance(a, Zero) or isinstance(b, Zero):
            return Zero()

        if isinstance(a, SignedBinary) or isinstance(b, SignedBinary):
            if isinstance(a, SignedBinary) and isinstance(b, SignedBinary):
                return a * b
            multiplication = a * b
            multiplication.set_len_ints(newlength, newints)
            return multiplication

        QFloatBase.MULTIPLICATION += 1
        assert a.is_base_tidy
        assert b.is_base_tidy
        if not a.base == b.base:
            raise ValueError("bases are different")

        cols = _mul_window(a.array, a.ints, b.array, b.ints, newlength, newints)
        sign = a.sign * b.sign
        multiplication = QFloat(cols, newints, a.base, False, sign)
        return multiplication

    @classmethod
    def multi_from_mul(cls, list_a, list_b, newlength=None, newints=None):
        """Grouped multiply of element pairs (reference qfloat.py:1023-1181).

        QFloat x QFloat pairs are stacked on a new leading axis and run
        through one windowed multiply + one batched tidy; Zero/SignedBinary
        pairs take their static fast paths.  Results are identical to
        per-pair :meth:`from_mul`.
        """
        a0 = next((a for a in list_a if isinstance(a, QFloatBase)), None)
        b0 = next((b for b in list_b if isinstance(b, QFloatBase)), None)
        if newlength is None:
            newlength = len(a0) if a0 is not None else len(b0)
        if newints is None:
            newints = a0.ints if a0 is not None else b0.ints
        assert len(list_a) == len(list_b)

        list_ab = [None] * len(list_a)
        idx_qf = []
        for i, (a, b) in enumerate(zip(list_a, list_b)):
            if isinstance(a, Zero) or isinstance(b, Zero):
                list_ab[i] = Zero()
            elif isinstance(a, SignedBinary) or isinstance(b, SignedBinary):
                if isinstance(a, SignedBinary) and isinstance(b, SignedBinary):
                    list_ab[i] = a * b
                else:
                    ab = a * b
                    ab.set_len_ints(newlength, newints)
                    list_ab[i] = ab
            else:
                idx_qf.append(i)

        QFloatBase.MULTIPLICATION += len(idx_qf)
        if not idx_qf:
            return list_ab
        for i in idx_qf:
            assert list_a[i].is_base_tidy and list_b[i].is_base_tidy

        a_stack = jnp.stack([list_a[i].array for i in idx_qf], axis=0)
        b_stack = jnp.stack([list_b[i].array for i in idx_qf], axis=0)
        cols = _mul_window(
            a_stack, a0.ints, b_stack, b0.ints, newlength, newints
        )
        cols = limbs.base_tidy(cols, a0.base)
        for k, i in enumerate(idx_qf):
            sign = list_a[i].sign * list_b[i].sign
            list_ab[i] = QFloat(cols[k], newints, a0.base, True, sign)
        return list_ab

    # ---- division (reference qfloat.py:1183-1376) -------------------------
    def __itruediv__(self, other):
        if isinstance(other, Zero):
            raise ValueError("division by Zero")

        if isinstance(other, SignedBinary):
            # signed pass-through; dividing by 0 saturates (reference
            # qfloat.py:1199-1210)
            v = other.value
            is_zero = (v == 0) * 1
            sat = jnp.full(self._array.shape, self._base - 1, self._array.dtype)
            iz = _dfac(is_zero)
            self._array = (1 - iz) * self._array + iz * sat
            self._sign = (1 - is_zero) * v + is_zero * self._sign
            return self

        assert other.is_base_tidy
        QFloatBase.DIVISION += 1
        self.check_compatibility(other)
        assert self._is_base_tidy

        fp = len(self) - self._ints
        zeros = jnp.zeros(self._array.shape[:-1] + (fp,), self._array.dtype)
        shift_arr = jnp.concatenate([self._array, zeros], axis=-1)
        div_array = limbs.base_p_division(shift_arr, other._array, self._base)
        self._sign = self.sign * other.sign
        self._array = div_array[..., fp:]
        return self

    def invert(self, sign=1, newlength=None, newints=None):
        """Signed reciprocal at a chosen output format.

        Reference qfloat.py:1263-1309: divides ``1`` left-shifted by
        (old + new) fraction precision by this QFloat's digits, then crops
        or pads to ``newlength``.
        """
        _check_invert_sign(sign)
        QFloatBase.DIVISION += 1
        assert self._is_base_tidy

        if newlength is None:
            newlength = len(self)
        if newints is None:
            newints = self._ints

        fp = newlength - newints
        fpself = len(self) - self._ints
        shift = jnp.zeros(self._array.shape[:-1] + (1 + fpself + fp,), self._array.dtype)
        shift_arr = shift.at[..., 0].set(1)
        div_array = limbs.base_p_division(shift_arr, self._array, self._base)

        diff = newlength - div_array.shape[-1]
        if diff > 0:
            pad = jnp.zeros(div_array.shape[:-1] + (diff,), div_array.dtype)
            div_array = jnp.concatenate([pad, div_array], axis=-1)
        elif diff < 0:
            div_array = div_array[..., -newlength:]
        sb = sign.value if isinstance(sign, SignedBinary) else sign
        newsign = sb * self.sign
        return QFloat(div_array, newints, self._base, True, newsign)

    @classmethod
    def multi_invert(cls, list_qfloats, sign=1, newlength=None, newints=None):
        """Grouped reciprocal (reference qfloat.py:1311-1376)."""
        _check_invert_sign(sign)
        qf0 = list_qfloats[0]
        for q in list_qfloats:
            assert isinstance(q, cls) and q.is_base_tidy
            assert len(q) == len(qf0) and q.base == qf0.base and q.ints == qf0.ints
        QFloatBase.DIVISION += len(list_qfloats)

        if newlength is None:
            newlength = len(qf0)
        if newints is None:
            newints = qf0.ints

        b_stack = jnp.stack([q.array for q in list_qfloats], axis=0)
        fp = newlength - newints
        fpself = len(qf0) - qf0.ints
        shift = jnp.zeros(b_stack.shape[:-1] + (1 + fpself + fp,), b_stack.dtype)
        shift_arr = shift.at[..., 0].set(1)
        div_array = limbs.base_p_division(shift_arr, b_stack, qf0.base)
        diff = newlength - div_array.shape[-1]
        if diff > 0:
            pad = jnp.zeros(div_array.shape[:-1] + (diff,), div_array.dtype)
            div_array = jnp.concatenate([pad, div_array], axis=-1)
        elif diff < 0:
            div_array = div_array[..., -newlength:]
        sb = sign.value if isinstance(sign, SignedBinary) else sign
        return [
            QFloat(div_array[i], newints, qf0.base, True, sb * q.sign)
            for i, q in enumerate(list_qfloats)
        ]

    # ---- pivot support ----------------------------------------------------
    def blend_from(self, other, cond):
        """Branchless magnitude select used by the pivot argmax.

        Deliberately bug-compatible with reference qfloat.py:323-326
        (``qfloat_argmax``): the sign is NOT blended, only the digits.
        """
        c = _dfac(cond)
        self._array = c * other._array + (1 - c) * self._array
        return self


def _check_invert_sign(sign):
    if not (
        isinstance(sign, SignedBinary)
        or (isinstance(sign, numbers.Integral) and abs(sign) == 1)
    ):
        raise ValueError("sign must be a SignedBinary or a signed binary scalar")


def _mul_window(a, a_ints, b, b_ints, newlength, newints):
    """Column sums of the cropped partial-product array.

    Implements the window math of reference qfloat.py:995-1016: partial
    product row i (``a[i] * b``) is shifted to output position
    ``indb = newints - a_ints + i + 1 - b_ints`` and cropped to the output
    window *before* summation.  Returns the untidy column sums.
    """
    la = a.shape[-1]
    lb = b.shape[-1]
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    out = jnp.zeros(batch + (newlength,), a.dtype)
    for i in range(la):
        indb = newints - a_ints + i + 1 - b_ints
        ind1 = 0 if indb >= 0 else -indb
        ind2 = min(lb, newlength - indb)
        if ind2 > ind1:
            contrib = a[..., i : i + 1] * b[..., ind1:ind2]
            out = out.at[..., indb + ind1 : indb + ind2].add(contrib)
    return out


# ---------------------------------------------------------------------------
# Backend-dispatch helpers used by the linear-algebra layer: they pick the
# concrete QFloat subclass present among the operands so the same algorithm
# code runs on either backend.
# ---------------------------------------------------------------------------


def qf_class_of(*xs):
    for x in xs:
        if isinstance(x, QFloatBase):
            return type(x)
    for x in xs:
        for y in x if isinstance(x, (list, tuple)) else ():
            if isinstance(y, QFloatBase):
                return type(y)
    return None


def qf_from_mul(a, b, newlength=None, newints=None):
    cls = qf_class_of(a, b)
    if cls is None:
        if isinstance(a, Zero) or isinstance(b, Zero):
            return Zero()
        return a * b
    return cls.from_mul(a, b, newlength, newints)


def qf_multi_from_mul(list_a, list_b, newlength=None, newints=None):
    cls = qf_class_of(list_a, list_b)
    if cls is None:
        return [qf_from_mul(a, b, newlength, newints) for a, b in zip(list_a, list_b)]
    return cls.multi_from_mul(list_a, list_b, newlength, newints)


def qf_multi_invert(list_qfloats, sign=1, newlength=None, newints=None):
    cls = qf_class_of(list_qfloats)
    return cls.multi_invert(list_qfloats, sign, newlength, newints)
