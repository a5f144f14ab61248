"""Fused whole-inversion Pallas kernel.

One kernel launch runs the ENTIRE batched QFloat matrix inversion —
pivoting, LU decomposition, forward/backward substitution (or the 2x2
closed form) — for a tile of the batch, fully VMEM-resident.

Why: the XLA lowering of the packed circuit is HBM-traffic-bound, not
VPU-bound.  Every ``lax.scan`` step of every multiply and every fusion
boundary round-trips batch-sized int64 tensors through HBM; at 1M batch
that is ~45 kB of traffic per inversion, which at v5e bandwidth caps
throughput almost exactly at the measured 18.3M inversions/s (NOTES.md).
This kernel reads 16 cells (hi, lo, sign) once and writes them once:
~0.4 kB per inversion, ~100x less traffic, leaving the VPU as the limit.

How: the kernel body is the *same trace-time circuit machinery* as every
other lowering — models/qfloat_lu.py run with
:class:`~matrix_inversion_tpu.ops.pair_qfloat.PairQFloat` cells (uint32
(hi, lo) pairs, the register width Mosaic actually has).  Bit-exactness
with the unrolled packed lowering is therefore structural (same op
sequence, pair ops property-tested) and verified end-to-end in
tests/test_fused.py.

Grid-free by necessity: the remote-compile Mosaic stack rejects every
grid-style kernel (NOTES.md), so large batches are chunked at the XLA
level with ``lax.map`` like ops/pallas_kernels.py does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.qfloat import SignedBinary
from . import pair_math as pm
from .pair_qfloat import PairQFloat, _sign_arr

LANES = 128
SUBLANES = 8

# Rows (of 128 lanes) per kernel launch, re-swept on v5e with the
# single-word floor-correction multiply + one-sided-fixup division (High
# preset, inversions/s; 1M batch n=4, 262k others):
#   n=4: 24 -> 61.3M, 32 -> 66.1M, 40 -> 66.9M, 48 -> 63.0M, 64 -> 64.3M,
#        96 -> 65.2M
# (previous sweeps: trunc multiply optimum 32 rows at 61.5M, windowed
# multiply optimum 64 rows at 52.2M — the optimum tracks live-state size)
_TILE_ROWS_DEFAULT = 40
# n >= 9 defaults to 16 rows: live state grows ~n^2 cells and the larger
# tiles stop fitting the scoped-VMEM budget (n=10 measured at tile 16:
# 8.4M inv/s, benchmarks/results/fused.json)
_TILE_ROWS_BY_N = {2: 128, 3: 32, 5: 16, 6: 16, 9: 16, 10: 16, 11: 16, 12: 16}
# n=2: 128 rows measured optimal under round-5 MARGINAL timing (805M vs
# 696M inv/s at the old 48-row default; peak confirmed against 96/112/
# 160/256/512 neighbors, results/fused.json tile entries).  The round-4
# chain-timing tile sweep that picked 48 folded a fixed tunnel sync into
# every rate and is superseded.  n=3 is tile-flat (146-147M from 32-128).
# explicit user override (set_tile_rows); None = use the per-n table above.
# A separate flag (not a sentinel value) so set_tile_rows(40) really forces
# 40 rows for every n instead of silently re-enabling the per-n defaults.
_TILE_ROWS_OVERRIDE = None


def set_tile_rows(rows):
    """Force the kernel batch tile to ``rows`` (None = per-n defaults)."""
    global _TILE_ROWS_OVERRIDE
    _TILE_ROWS_OVERRIDE = None if rows is None else int(rows)


def _default_tile_rows(n):
    if _TILE_ROWS_OVERRIDE is not None:
        return _TILE_ROWS_OVERRIDE
    return _TILE_ROWS_BY_N.get(n, _TILE_ROWS_DEFAULT)


def fused_inverse_body(hi, lo, sg, n, qfloat_len, qfloat_ints, base,
                       true_division, track=False):
    """The whole inversion on stacked (n*n, ...) uint32 pair words.

    Pure jnp: this is both the Pallas kernel body (on VMEM-loaded tiles)
    and an eagerly-testable function (tests/test_fused.py runs it directly
    against the packed unrolled lowering — no Pallas required).

    ``track=True`` additionally returns a per-batch-element overflow flag
    (int32, OR of every normalization/division overflow inside the
    inversion) — the reference's open TODO (reference qfloat.py:255-257;
    overflow is its documented main big-error source, README.md:119-121).
    The PairQFloat ops record into the same ``track_overflow`` scope the
    packed backend uses, so the flags are bit-identical to the tracked
    unroll lowering (tests/test_overflow.py); multiplies fall back from the
    truncated to the windowed form inside the scope (see ops/pair_qfloat).
    """
    from ..models.qfloat_lu import (
        lu_from_pivot,
        qfloat_inverse_2x2,
        qfloat_lu_inverse,
        qfloat_pivot_cells,
    )
    from .packed import track_overflow

    def run():
        cells = [
            PairQFloat(hi[idx], lo[idx], qfloat_len, qfloat_ints, base,
                       sg[idx])
            for idx in range(n * n)
        ]
        M = [cells[i * n:(i + 1) * n] for i in range(n)]

        if n == 2:
            return qfloat_inverse_2x2(M, qfloat_len, qfloat_ints)
        P = [
            [SignedBinary(c) for c in row]
            for row in qfloat_pivot_cells(M)
        ]
        Pb, Lm, Um = lu_from_pivot(
            P, M, qfloat_len, qfloat_ints, true_division, False
        )
        return qfloat_lu_inverse(
            Pb, Lm, Um, qfloat_len, qfloat_ints, true_division, False
        )

    ovf = None
    if track:
        with track_overflow() as tracker:
            Minv = run()
            # OR all recorded flags into one int32 per batch element; keep
            # it in boolean algebra (Mosaic cannot select on i1 vectors)
            ovf = jnp.zeros_like(hi[0], dtype=jnp.int32)
            for f in tracker.flags:
                ovf = ovf | f.astype(jnp.int32)
    else:
        Minv = run()

    ohi, olo, osg = [], [], []
    for i in range(n):
        for j in range(n):
            cell = Minv[i][j]
            assert isinstance(cell, PairQFloat), type(cell)
            ohi.append(cell.hi)
            olo.append(cell.lo)
            osg.append(_sign_arr(cell.sign, cell.hi).astype(jnp.int32))
    if track:
        return ohi, olo, osg, ovf
    return ohi, olo, osg


def _fused_kernel(n, qfloat_len, qfloat_ints, base, true_division, track,
                  hi_ref, lo_ref, sg_ref, ohi_ref, olo_ref, osg_ref,
                  ovf_ref=None):
    n2 = n * n
    out = fused_inverse_body(
        [hi_ref[i] for i in range(n2)],
        [lo_ref[i] for i in range(n2)],
        [sg_ref[i] for i in range(n2)],
        n, qfloat_len, qfloat_ints, base, true_division, track=track,
    )
    if track:
        ohi, olo, osg, ovf = out
        ovf_ref[...] = ovf
    else:
        ohi, olo, osg = out
    for i in range(n2):
        ohi_ref[i] = ohi[i]
        olo_ref[i] = olo[i]
        osg_ref[i] = osg[i]


def _fused_call(hi, lo, sg, n, qfloat_len, qfloat_ints, base, true_division,
                interpret, track=False):
    n2, rows, _ = hi.shape
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _fused_kernel, n, qfloat_len, qfloat_ints, base, true_division, track
    )
    shape = (n2, rows, LANES)
    out_shape = (
        jax.ShapeDtypeStruct(shape, jnp.uint32),
        jax.ShapeDtypeStruct(shape, jnp.uint32),
        jax.ShapeDtypeStruct(shape, jnp.int32),
    )
    if track:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        )
    return pl.pallas_call(
        kernel,
        in_specs=[spec, spec, spec],
        out_specs=(spec,) * len(out_shape),
        out_shape=out_shape,
        # the default 16 MB scoped-vmem budget caps the tile at 32 rows;
        # raising it lets larger tiles compile (measured in the tile sweep)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(hi, lo, sg)


def fused_matrix_inverse(mags, signs, n, qfloat_len, qfloat_ints, base,
                         true_division, tile_rows=None, interpret=False,
                         track=False):
    """Whole-inversion fused kernel over arbitrarily large batches.

    Same contract as the packed-I/O circuit body
    (``models.inverse.qfloat_matrix_inverse_packed_io``): ``(..., n*n)``
    int64 magnitudes + signs in, the same (int64) out — bit-identical
    results, one kernel launch per batch tile instead of one XLA kernel
    per op.  ``track=True`` returns ``(mags, signs, overflowed)`` with an
    int32 per-matrix overflow flag, bit-identical to the tracked unroll
    lowering (see ``fused_inverse_body``).
    """
    tile_rows = tile_rows or _default_tile_rows(n)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # Mosaic is TPU-only; CPU runs use the interpreter
    # Measurement note (round 5): the overflow-tracked kernel variant
    # repeatedly measured ~20% faster than the untracked one at n=2.  A
    # controlled A/B (route untracked through the tracked kernel, then
    # time both "variants" — now the IDENTICAL program — in the same
    # sweep) reproduced the 28% gap anyway: it is POSITION BIAS of the
    # measurement harness at n=2 (the second timing slot in a sweep
    # measures faster; n=2 is the most launch-sensitive size), not a
    # kernel property.  Do not "optimize" n=2 by adding the flag output.
    kernel_track = track
    mags = jnp.asarray(mags, jnp.int64)
    n2 = n * n
    assert mags.shape[-1] == n2
    bshape = mags.shape[:-1]
    b = int(np.prod(bshape)) if bshape else 1

    # (..., n2) -> (n2, B): cell-major so each (rows, 128) tile of one cell
    # is contiguous for the kernel
    flat_m = jnp.moveaxis(mags.reshape(b, n2), -1, 0)
    flat_s = jnp.moveaxis(
        jnp.broadcast_to(jnp.asarray(signs), bshape + (n2,)).reshape(b, n2), -1, 0
    ).astype(jnp.int32)

    min_chunk = SUBLANES * LANES
    padded = ((b + min_chunk - 1) // min_chunk) * min_chunk
    rows = padded // LANES
    if rows % tile_rows:
        tile_rows = min(tile_rows, rows)
        rows = ((rows + tile_rows - 1) // tile_rows) * tile_rows
        padded = rows * LANES
    tile_rows = min(tile_rows, rows)
    if padded != b:
        # pad with identity-ish zeros: all ops are branchless, padding runs
        # through the same circuit and is sliced off afterwards
        flat_m = jnp.concatenate(
            [flat_m, jnp.zeros((n2, padded - b), jnp.int64)], axis=-1
        )
        flat_s = jnp.concatenate(
            [flat_s, jnp.ones((n2, padded - b), jnp.int32)], axis=-1
        )

    hi, lo = pm.split64(flat_m.reshape(n2, rows, LANES))
    sg = flat_s.reshape(n2, rows, LANES)

    n_chunks = rows // tile_rows
    ovf = None
    if n_chunks == 1:
        out = _fused_call(
            hi, lo, sg, n, qfloat_len, qfloat_ints, base, true_division,
            interpret, track=kernel_track,
        )
        if kernel_track:
            ohi, olo, osg, ovf = out
        else:
            ohi, olo, osg = out
    else:
        chunked = lambda a: a.reshape(n2, n_chunks, tile_rows, LANES).swapaxes(0, 1)
        out = lax.map(
            lambda args: _fused_call(
                *args, n, qfloat_len, qfloat_ints, base, true_division,
                interpret, track=kernel_track,
            ),
            (chunked(hi), chunked(lo), chunked(sg)),
        )
        if kernel_track:
            ohi, olo, osg, ovf = out
            ovf = ovf.reshape(rows, LANES)
        else:
            ohi, olo, osg = out
        unchunk = lambda a: a.swapaxes(0, 1).reshape(n2, rows, LANES)
        ohi, olo, osg = unchunk(ohi), unchunk(olo), unchunk(osg)

    out_m = pm.join64(ohi.reshape(n2, -1), olo.reshape(n2, -1)).astype(jnp.int64)
    out_s = osg.reshape(n2, -1).astype(jnp.int64)
    out_m = jnp.moveaxis(out_m[:, :b], 0, -1).reshape(bshape + (n2,))
    out_s = jnp.moveaxis(out_s[:, :b], 0, -1).reshape(bshape + (n2,))
    if track:
        flag = ovf.reshape(-1)[:b].reshape(bshape)
        return out_m, out_s, flag
    return out_m, out_s
