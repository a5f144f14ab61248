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

from . import pair_math

LANES = 128
SUBLANES = 8
_U32 = jnp.uint32

_split64 = pair_math.split64
_join64 = pair_math.join64


def _division_kernel(n_digits, bits, vhi_ref, vlo_ref, dhi_ref, dlo_ref,
                     qhi_ref, qlo_ref):
    qhi, qlo = pair_math.div_classic(
        vhi_ref[:], vlo_ref[:], dhi_ref[:], dlo_ref[:], n_digits, bits
    )
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


def _division_float_kernel(n_bits, k, vhi_ref, vlo_ref, dhi_ref, dlo_ref,
                           qhi_ref, qlo_ref):
    """Radix-2**k long division, f32 estimate + exact fixups, VMEM-resident.

    The Pallas form of ``ops.packed._long_division_float`` (same chunking,
    same fixup bounds — see _float_div_chunk_bits there), on explicit
    uint32 (hi, lo) pairs (pair_math.div_float).  Bit-exact with the
    restoring-loop kernels; property-tested in tests/test_pallas.py.
    """
    qhi, qlo = pair_math.div_float(
        vhi_ref[:], vlo_ref[:], dhi_ref[:], dlo_ref[:], n_bits, k
    )
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


def _mul_window_kernel(consts, out_mask, ahi_ref, alo_ref, bhi_ref, blo_ref,
                       qhi_ref, qlo_ref):
    """Base-2 cropped partial-product sum, fully VMEM-resident.

    Pair form of ``ops.packed._mul_window_packed`` (pair_math.mul_window,
    property-tested in tests/test_pallas.py); the win is that the 40-step
    chain lives in registers instead of round-tripping an XLA loop carry
    through HBM.
    """
    qhi, qlo = pair_math.mul_window(
        ahi_ref[:], alo_ref[:], bhi_ref[:], blo_ref[:], consts, out_mask
    )
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
