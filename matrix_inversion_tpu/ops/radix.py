"""Host-side radix conversion: floats/ints <-> base-p digit arrays.

Semantics match the reference converters exactly
(reference matrix_inversion/base_p_arrays.py:11-81), but every function here
is *vectorized over a leading batch shape*: quantizing 10^5 matrices is a
handful of numpy ops instead of 10^5 Python loops.  Digit arrays are
most-significant-digit first (digit j of an ``n``-digit array has place value
``p**(n-1-j)``), signs are carried separately or multiplied into the digits
exactly as in the reference.
"""

from __future__ import annotations

import numpy as np


def int_to_base_p(integers, n: int, p: int) -> np.ndarray:
    """Convert (batched) integers to signed base-p digit arrays.

    Matches reference base_p_arrays.py:24-48: digits of ``|x|``, multiplied
    by ``sign(x)``.  ``integers`` may be any shape; output has a trailing
    digit axis of size ``n``.
    """
    integers = np.asarray(integers)
    if n == 0:
        return np.zeros(integers.shape + (0,), dtype=np.int64)
    if p <= 1:
        raise ValueError("Invalid input values")
    sgn = np.sign(integers).astype(np.int64)
    mag = np.abs(integers).astype(np.int64)
    digits = np.zeros(integers.shape + (n,), dtype=np.int64)
    for i in reversed(range(n)):
        power = p ** i
        div = mag // power
        mag = mag - div * power
        digits[..., n - 1 - i] = div
    return digits * sgn[..., None]


def float_to_base_p(f, precision: int, p: int) -> np.ndarray:
    """Convert (batched) floats in (-1, 1) to signed base-p fraction digits.

    Digit i has place value ``p**-(i+1)``.  Reproduces the float64
    multiply-truncate loop of reference base_p_arrays.py:62-81 step for step
    (so any float rounding behaves identically).
    """
    f = np.asarray(f, dtype=np.float64)
    sgn = np.sign(f)
    mag = np.abs(f)
    if np.any(mag >= 1.0):
        raise AssertionError("Input should be a float between 0 and 1 (exclusive)")
    digits = np.zeros(f.shape + (precision,), dtype=np.int64)
    for i in range(precision):
        mag = mag * p
        d = mag.astype(np.int64)  # truncation toward zero, like int(f)
        mag = mag - d  # subtracting 0 is a no-op, same as the reference branch
        digits[..., i] = d
    return digits * sgn[..., None].astype(np.int64)


def base_p_to_int(digits, p: int):
    """Signed base-p digit array (trailing axis) -> integers.

    Matches reference base_p_arrays.py:11-21.
    """
    digits = np.asarray(digits, dtype=np.int64)
    n = digits.shape[-1]
    place = p ** np.arange(n - 1, -1, -1, dtype=np.int64)
    return np.sum(digits * place, axis=-1)


def base_p_to_float(digits, p: int):
    """Signed base-p fraction digits -> float of the form 0.xxx.

    Matches reference base_p_arrays.py:51-59 including summation order
    (sequential add from the most significant fraction digit).
    """
    digits = np.asarray(digits, dtype=np.float64)
    n = digits.shape[-1]
    out = np.zeros(digits.shape[:-1], dtype=np.float64)
    for i in range(n):
        out = out + digits[..., i] * (float(p) ** -(i + 1))
    return out


def float_to_digits_and_sign(f, length: int, ints: int, p: int):
    """Quantize (batched) floats to (|digits|, sign) in the QFloat layout.

    The QFloat layout is ``ints`` integer digits followed by
    ``length - ints`` fraction digits; sign of 0.0 is +1
    (reference qfloat.py:375-397).

    Large batches dispatch to the native multithreaded kernel
    (native/qmarshal.cc) when built; semantics are identical.
    """
    f = np.asarray(f, dtype=np.float64)
    if f.size >= 4096:
        from ..runtime import native

        if native.available():
            digits, signs = native.quantize_digits(f, length, ints, p)
            return digits.astype(np.int64), signs.astype(np.int64)
    integer_part = f.astype(np.int64)  # trunc toward zero, like int(f)
    float_part = f - integer_part
    int_digits = int_to_base_p(integer_part, ints, p)
    frac_digits = float_to_base_p(float_part, length - ints, p)
    digits = np.concatenate([int_digits, frac_digits], axis=-1)
    sign = np.sign(f).astype(np.int64)
    sign = np.where(sign == 0, 1, sign)  # zero has sign 1
    return np.abs(digits), sign


def digits_and_sign_to_float(digits, sign, ints: int, p: int):
    """Inverse of :func:`float_to_digits_and_sign` (reference qfloat.py:399-410)."""
    digits = np.asarray(digits)
    if digits.size >= 4096 * max(1, digits.shape[-1]):
        from ..runtime import native

        if native.available():
            arr = np.concatenate(
                [
                    np.asarray(digits, np.int32),
                    np.asarray(sign, np.int32)[..., None],
                ],
                axis=-1,
            )
            return native.dequantize_digits(arr, digits.shape[-1], ints, p)
    integer_part = base_p_to_int(digits[..., :ints], p).astype(np.float64)
    float_part = base_p_to_float(digits[..., ints:], p)
    return (integer_part + float_part) * np.asarray(sign, dtype=np.float64)


def pack_digits(digits, p: int):
    """Digit arrays -> int64 magnitudes (the packed backend representation).

    ``mag = sum_j digits[..., j] * p**(L-1-j)``; requires ``p**L < 2**63``.
    """
    digits = np.asarray(digits, dtype=np.int64)
    n = digits.shape[-1]
    place = p ** np.arange(n - 1, -1, -1, dtype=np.int64)
    return np.sum(digits * place, axis=-1)


def unpack_digits(mag, length: int, p: int):
    """int64 magnitudes -> digit arrays (trailing axis ``length``)."""
    mag = np.asarray(mag, dtype=np.int64)
    digits = np.zeros(mag.shape + (length,), dtype=np.int64)
    for i in range(length - 1, -1, -1):
        digits[..., i] = mag % p
        mag = mag // p
    return digits
