"""Pallas TPU kernels for the hot ops.

The profile of a batched QFloat inversion is dominated by restoring long
division (reference base_p_arrays.py:173-203; SURVEY.md section 3.2 "hot
loops").  The XLA path (``PackedQFloat._long_division``) runs an
O(digits) ``fori_loop`` whose int64 carries round-trip HBM every step; this
kernel instead keeps the remainder/quotient resident in VMEM for the whole
loop, operating on explicit uint32 (hi, lo) pairs — the native register
width of the TPU VPU — with the digit loop fully unrolled at trace time.

Exactness: identical to the int64 restoring loop (same compare/subtract
recurrence, same division-by-zero saturation), property-tested against the
XLA path in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
_U32 = jnp.uint32


def _split64(x):
    x = x.astype(jnp.uint64)
    return (x >> jnp.uint64(32)).astype(_U32), (x & jnp.uint64(0xFFFFFFFF)).astype(_U32)


def _join64(hi, lo):
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


def _division_kernel(n_digits, bits, vhi_ref, vlo_ref, dhi_ref, dlo_ref,
                     qhi_ref, qlo_ref):
    base_mask = _U32((1 << bits) - 1)
    vhi = vhi_ref[:]
    vlo = vlo_ref[:]
    dhi = dhi_ref[:]
    dlo = dlo_ref[:]
    zero = jnp.zeros_like(vhi)
    rhi, rlo = zero, zero
    qhi, qlo = zero, zero

    for i in range(n_digits):
        shift = (n_digits - 1 - i) * bits
        # power-of-two digit widths never straddle the 32-bit boundary
        if shift >= 32:
            digit = (vhi >> _U32(shift - 32)) & base_mask
        else:
            digit = (vlo >> _U32(shift)) & base_mask
        # r = (r << bits) | digit
        rhi = (rhi << _U32(bits)) | (rlo >> _U32(32 - bits))
        rlo = (rlo << _U32(bits)) | digit

        qdigit = zero
        for _ in range((1 << bits) - 1):
            ge = (rhi > dhi) | ((rhi == dhi) & (rlo >= dlo))
            borrow = (rlo < dlo) & ge
            rlo = jnp.where(ge, rlo - dlo, rlo)
            rhi = jnp.where(ge, rhi - dhi - borrow.astype(_U32), rhi)
            qdigit = qdigit + ge.astype(_U32)
        # q = (q << bits) | qdigit
        qhi = (qhi << _U32(bits)) | (qlo >> _U32(32 - bits))
        qlo = (qlo << _U32(bits)) | qdigit

    qhi_ref[:] = qhi
    qlo_ref[:] = qlo


def _division_call(vhi, vlo, dhi, dlo, n_digits, bits, interpret):
    """One grid-free pallas_call over a (rows, 128) chunk.

    Grid-free because the remote-compile Mosaic stack in this environment
    fails to legalize ANY grid-style kernel ("failed to legalize operation
    'func.return'"); chunking happens at the XLA level instead (the chunks
    are independent kernel launches XLA schedules back to back).
    """
    rows = vhi.shape[0]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_division_kernel, n_digits, bits)
    return pl.pallas_call(
        kernel,
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), _U32),
            jax.ShapeDtypeStruct((rows, LANES), _U32),
        ),
        interpret=interpret,
    )(vhi, vlo, dhi, dlo)


def _tiled_pairs(call, inputs, pad_values, tile_rows, interpret):
    """Run a grid-free (hi, lo)-pair kernel over arbitrarily large batches.

    ``inputs``: int64 arrays (broadcast to a common shape); ``pad_values``:
    per-input scalar fill for the alignment padding.  ``call(pairs,
    interpret)`` receives a flat tuple (hi0, lo0, hi1, lo1, ...) of
    (rows, 128) uint32 tiles and returns an output (hi, lo) pair.  Chunks
    are looped with ``lax.map`` so compile time is independent of batch
    size.  Returns the int64 output reshaped to the broadcast shape.
    """
    shape = jnp.broadcast_shapes(*[jnp.shape(x) for x in inputs])
    flats = [
        jnp.broadcast_to(jnp.asarray(x, jnp.int64), shape).reshape(-1)
        for x in inputs
    ]
    n = int(np.prod(shape)) if shape else 1

    min_chunk = SUBLANES * LANES
    padded = ((n + min_chunk - 1) // min_chunk) * min_chunk
    rows = padded // LANES
    if rows % tile_rows:
        tile_rows = min(tile_rows, rows)
        rows = ((rows + tile_rows - 1) // tile_rows) * tile_rows
        padded = rows * LANES
    tile_rows = min(tile_rows, rows)
    if padded != n:
        flats = [
            jnp.concatenate([f, jnp.full((padded - n,), pv, jnp.int64)])
            for f, pv in zip(flats, pad_values)
        ]

    pairs = []
    for f in flats:
        hi, lo = _split64(f.reshape(rows, LANES))
        pairs += [hi, lo]

    n_chunks = rows // tile_rows
    if n_chunks == 1:
        qhi, qlo = call(tuple(pairs), interpret)
    else:
        chunked = lambda a: a.reshape(n_chunks, tile_rows, LANES)
        qhi, qlo = lax.map(
            lambda args: call(args, interpret),
            tuple(chunked(p) for p in pairs),
        )
        qhi = qhi.reshape(rows, LANES)
        qlo = qlo.reshape(rows, LANES)
    q = _join64(qhi, qlo).reshape(-1)[:n].astype(jnp.int64)
    return q.reshape(shape)


# Default rows per division-kernel tile; tunable for on-chip sweeps.
_DIVISION_TILE_ROWS = 512


def set_division_tile_rows(rows):
    global _DIVISION_TILE_ROWS
    _DIVISION_TILE_ROWS = int(rows)


def batched_long_division(dividend, divisor, n_digits: int, bits: int,
                          tile_rows: int = None, interpret: bool = False):
    """q = dividend // divisor digit-by-digit, uint32-pair Pallas kernel.

    ``dividend``/``divisor``: int64 arrays broadcastable to a common batch
    shape; values in [0, 2**(n_digits*bits)).  Division by zero saturates
    every quotient digit to ``base-1`` exactly like the XLA/reference path.
    Large batches are split into <= tile_rows x 128 chunks, each a VMEM-
    resident kernel launch.
    """
    return _tiled_pairs(
        lambda pairs, interp: _division_call(*pairs, n_digits, bits, interp),
        (dividend, divisor),
        (0, 1),
        tile_rows or _DIVISION_TILE_ROWS,
        interpret,
    )


def _to_f32(hi, lo):
    """(hi, lo) uint32 pair -> f32, in signed-int-safe pieces.

    Mosaic's reliable integer->float convert is s32->f32, so every piece
    is kept below 2**31: hi < 2**30 for our < 2**62 values, lo is split
    8/24.  lo >> 8 < 2**24 and lo & 255 convert exactly; the two adds
    round once each, so the total relative error is <= ~2**-23 — far
    inside the +-2 fixup budget of the float-assisted division.
    """
    return (
        hi.astype(jnp.int32).astype(jnp.float32) * 4294967296.0
        + (lo >> _U32(8)).astype(jnp.int32).astype(jnp.float32) * 256.0
        + (lo & _U32(255)).astype(jnp.int32).astype(jnp.float32)
    )


def _division_float_kernel(n_bits, k, vhi_ref, vlo_ref, dhi_ref, dlo_ref,
                           qhi_ref, qlo_ref):
    """Radix-2**k long division, f32 estimate + exact fixups, VMEM-resident.

    The Pallas form of ``ops.packed._long_division_float`` (same chunking,
    same fixup bounds — see _float_div_chunk_bits there), on explicit
    uint32 (hi, lo) pairs.  Bit-exact with the restoring-loop kernels;
    property-tested in tests/test_pallas.py.
    """
    vhi = vhi_ref[:]
    vlo = vlo_ref[:]
    dhi = dhi_ref[:]
    dlo = dlo_ref[:]
    zero = jnp.zeros_like(vhi)

    is_zero = (dhi | dlo) == 0
    # divide by 1 when the divisor is 0, saturate later (scalar where
    # operands become closed_calls Mosaic cannot lower — keep arrays)
    dslo = jnp.where(is_zero, jnp.ones_like(dlo), dlo)
    df = _to_f32(dhi, dslo)
    # 16-bit limbs of the divisor for the q_est * divisor partial products
    d0 = dslo & _U32(0xFFFF)
    d1 = dslo >> _U32(16)
    d2 = dhi & _U32(0xFFFF)
    d3 = dhi >> _U32(16)

    rhi, rlo = zero, zero
    qhi, qlo = zero, zero
    n_chunks = -(-n_bits // k)
    first = n_bits - k * (n_chunks - 1)
    consumed = 0
    for c in range(n_chunks):
        kc = first if c == 0 else k
        consumed += kc
        chi, clo = _shr_pair(vhi, vlo, n_bits - consumed)
        chunk = clo & _U32((1 << kc) - 1)
        rhi, rlo = _shl_pair(rhi, rlo, kc)
        rlo = rlo | chunk

        qc = jnp.floor(_to_f32(rhi, rlo) / df).astype(jnp.int32)
        qc = jnp.minimum(jnp.maximum(qc, 0), (1 << (kc + 1)) - 1).astype(_U32)

        # qd = qc * ds, 16-bit-limb partial products (all < 2**31)
        p1s = (qc * d1) << _U32(16)
        qdlo = qc * d0 + p1s
        carry = (qdlo < p1s).astype(_U32)
        qdhi = ((qc * d1) >> _U32(16)) + qc * d2 + ((qc * d3) << _U32(16)) + carry

        # rem = r - qd
        borrow = (rlo < qdlo).astype(_U32)
        remlo = rlo - qdlo
        remhi = rhi - qdhi - borrow

        for _ in range(2):  # estimate too high: remainder negative
            neg = remhi >> _U32(31)  # sign bit (|rem| < 2**62)
            m = _U32(0) - neg
            qc = qc - neg
            alo = dslo & m
            nl = remlo + alo
            remhi = remhi + (dhi & m) + (nl < alo).astype(_U32)
            remlo = nl
        for _ in range(2):  # estimate too low: remainder >= divisor
            ge = ((remhi > dhi) | ((remhi == dhi) & (remlo >= dslo))).astype(_U32)
            m = _U32(0) - ge
            qc = qc + ge
            slo = dslo & m
            b = (remlo < slo).astype(_U32)
            remlo = remlo - slo
            remhi = remhi - (dhi & m) - b

        rhi, rlo = remhi, remlo
        qhi, qlo = _shl_pair(qhi, qlo, kc)
        qlo = qlo | qc

    mask64 = (1 << n_bits) - 1
    qhi = jnp.where(is_zero, jnp.full_like(qhi, (mask64 >> 32) & 0xFFFFFFFF), qhi)
    qlo = jnp.where(is_zero, jnp.full_like(qlo, mask64 & 0xFFFFFFFF), qlo)
    qhi_ref[:] = qhi
    qlo_ref[:] = qlo


def _division_float_call(vhi, vlo, dhi, dlo, n_bits, k, interpret):
    rows = vhi.shape[0]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_division_float_kernel, n_bits, k)
    return pl.pallas_call(
        kernel,
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), _U32),
            jax.ShapeDtypeStruct((rows, LANES), _U32),
        ),
        interpret=interpret,
    )(vhi, vlo, dhi, dlo)


def batched_long_division_float(dividend, divisor, n_bits: int, k: int,
                                tile_rows: int = None,
                                interpret: bool = False):
    """Float-assisted exact division kernel over arbitrarily large batches.

    Same contract as :func:`batched_long_division` (q = dividend //
    divisor, zero divisor saturates the n_bits window) with ~k quotient
    bits resolved per sequential step instead of one digit.
    """
    return _tiled_pairs(
        lambda pairs, interp: _division_float_call(*pairs, n_bits, k, interp),
        (dividend, divisor),
        (0, 1),
        tile_rows or _DIVISION_TILE_ROWS,
        interpret,
    )


def _shr_pair(hi, lo, s):
    """Logical right shift of a (hi, lo) uint64 pair by a STATIC amount."""
    if s == 0:
        return hi, lo
    if s >= 32:
        return jnp.zeros_like(hi), hi >> _U32(s - 32)
    return hi >> _U32(s), (lo >> _U32(s)) | (hi << _U32(32 - s))


def _shl_pair(hi, lo, s):
    """Logical left shift of a (hi, lo) uint64 pair by a STATIC amount."""
    if s == 0:
        return hi, lo
    if s >= 32:
        return lo << _U32(s - 32), jnp.zeros_like(lo)
    return (hi << _U32(s)) | (lo >> _U32(32 - s)), lo << _U32(s)


def _and_pair(hi, lo, mask64):
    return hi & _U32((mask64 >> 32) & 0xFFFFFFFF), lo & _U32(mask64 & 0xFFFFFFFF)


def _mul_window_kernel(consts, out_mask, ahi_ref, alo_ref, bhi_ref, blo_ref,
                       qhi_ref, qlo_ref):
    """Base-2 cropped partial-product sum, fully VMEM-resident.

    Per digit i of ``a`` (a bit, base 2): select the statically-cropped
    window of ``b``, shift it to its output position, mask it by
    ``0 - bit`` (the AND form of a 0/1 multiply), and accumulate mod 2^64
    in explicit uint32 (hi, lo) pairs.  Digit-exact with the XLA path
    ``ops.packed._mul_window_packed`` (property-tested in
    tests/test_pallas.py); the win is that the 40-step chain lives in
    registers instead of round-tripping an XLA loop carry through HBM.
    """
    a_shs, b_shs, b_masks, o_shs = consts
    ahi = ahi_ref[:]
    alo = alo_ref[:]
    bhi = bhi_ref[:]
    blo = blo_ref[:]
    acc_hi = jnp.zeros_like(ahi)
    acc_lo = jnp.zeros_like(alo)

    for i in range(len(a_shs)):
        m64 = int(b_masks[i])
        if m64 == 0:
            continue
        s = int(a_shs[i])
        bit = ((ahi >> _U32(s - 32)) if s >= 32 else (alo >> _U32(s))) & _U32(1)
        neg = _U32(0) - bit
        whi, wlo = _shr_pair(bhi, blo, int(b_shs[i]))
        whi, wlo = _and_pair(whi, wlo, m64)
        xhi, xlo = _shl_pair(whi, wlo, int(o_shs[i]))
        xhi = xhi & neg
        xlo = xlo & neg
        new_lo = acc_lo + xlo
        carry = (new_lo < xlo).astype(_U32)
        acc_hi = acc_hi + xhi + carry
        acc_lo = new_lo

    qhi, qlo = _and_pair(acc_hi, acc_lo, out_mask)
    qhi_ref[:] = qhi
    qlo_ref[:] = qlo


def _mul_window_call(pairs, consts, out_mask, interpret):
    rows = pairs[0].shape[0]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_mul_window_kernel, consts, out_mask)
    return pl.pallas_call(
        kernel,
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), _U32),
            jax.ShapeDtypeStruct((rows, LANES), _U32),
        ),
        interpret=interpret,
    )(*pairs)


def batched_mul_window(a_mag, b_mag, consts, newlength: int,
                       tile_rows: int = 512, interpret: bool = False):
    """Windowed (cropped partial-product) multiply for base 2 on int64
    magnitudes — the Pallas form of ``ops.packed._mul_window_packed``.

    ``consts`` is the tuple from ``ops.packed._mul_window_consts``;
    ``newlength`` gives the output crop mask (digits == bits at base 2).
    """
    out_mask = (1 << newlength) - 1
    return _tiled_pairs(
        lambda pairs, interp: _mul_window_call(pairs, consts, out_mask, interp),
        (a_mag, b_mag),
        (0, 0),
        tile_rows,
        interpret,
    )


def pallas_available() -> bool:
    """Whether the TPU Pallas path should be used."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
