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


def batched_long_division(dividend, divisor, n_digits: int, bits: int,
                          tile_rows: int = 512, interpret: bool = False):
    """q = dividend // divisor digit-by-digit, uint32-pair Pallas kernel.

    ``dividend``/``divisor``: int64 arrays broadcastable to a common batch
    shape; values in [0, 2**(n_digits*bits)).  Division by zero saturates
    every quotient digit to ``base-1`` exactly like the XLA/reference path.
    Large batches are split into <= tile_rows x 128 chunks, each a VMEM-
    resident kernel launch.
    """
    shape = jnp.broadcast_shapes(jnp.shape(dividend), jnp.shape(divisor))
    dividend = jnp.broadcast_to(jnp.asarray(dividend, jnp.int64), shape)
    divisor = jnp.broadcast_to(jnp.asarray(divisor, jnp.int64), shape)
    n = int(np.prod(shape)) if shape else 1

    # pad the flat batch to (rows, 128) with rows a multiple of SUBLANES
    flat_v = dividend.reshape(-1)
    flat_d = divisor.reshape(-1)
    min_chunk = SUBLANES * LANES
    padded = ((n + min_chunk - 1) // min_chunk) * min_chunk
    rows = padded // LANES
    if padded != n:
        pad = padded - n
        flat_v = jnp.concatenate([flat_v, jnp.zeros((pad,), jnp.int64)])
        flat_d = jnp.concatenate([flat_d, jnp.ones((pad,), jnp.int64)])

    # round rows up to a whole number of tiles
    if rows % tile_rows:
        tile_rows = min(tile_rows, rows)
        new_rows = ((rows + tile_rows - 1) // tile_rows) * tile_rows
        extra = (new_rows - rows) * LANES
        flat_v = jnp.concatenate([flat_v, jnp.zeros((extra,), jnp.int64)])
        flat_d = jnp.concatenate([flat_d, jnp.ones((extra,), jnp.int64)])
        rows, padded = new_rows, new_rows * LANES
    tile_rows = min(tile_rows, rows)

    vhi, vlo = _split64(flat_v.reshape(rows, LANES))
    dhi, dlo = _split64(flat_d.reshape(rows, LANES))

    n_chunks = rows // tile_rows
    if n_chunks == 1:
        qhi, qlo = _division_call(vhi, vlo, dhi, dlo, n_digits, bits, interpret)
    else:
        # one kernel lowering, looped by XLA over the chunk axis — keeps
        # compile time independent of the batch size
        chunked = lambda a: a.reshape(n_chunks, tile_rows, LANES)
        qhi, qlo = lax.map(
            lambda args: _division_call(*args, n_digits, bits, interpret),
            (chunked(vhi), chunked(vlo), chunked(dhi), chunked(dlo)),
        )
        qhi = qhi.reshape(rows, LANES)
        qlo = qlo.reshape(rows, LANES)
    q = _join64(qhi, qlo).reshape(-1)[:n].astype(jnp.int64)
    return q.reshape(shape)


def pallas_available() -> bool:
    """Whether the TPU Pallas path should be used."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
