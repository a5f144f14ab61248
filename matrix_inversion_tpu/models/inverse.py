"""Circuit entry points: full inverse and the partial pivot/L/U circuits.

Mirrors reference qfloat_matrix_inversion.py:592-720.  These functions are
the jittable bodies: digit/sign tensors in, digit tensors out, with all
QFloat object machinery existing only at trace time.
"""

from __future__ import annotations

import numpy as np

from .marshal import (
    mags_and_signs_to_qfloat_matrix,
    qfloat_arrays_to_qfloat_matrix,
    qfloat_matrix_to_arrays_and_signs,
    qfloat_matrix_to_mags_and_signs,
)
from .qfloat_lu import (
    qfloat_inverse_2x2,
    qfloat_inverse_2x2_multi,
    qfloat_lu_decomposition,
    qfloat_lu_inverse,
    qfloat_pivot_matrix,
)


def _check_shapes(qfloat_arrays, n, qfloat_len):
    assert n * n == qfloat_arrays.shape[-2]
    assert qfloat_len == qfloat_arrays.shape[-1]


def qfloat_matrix_inverse(
    qfloat_arrays,
    qfloat_signs,
    n,
    qfloat_len,
    qfloat_ints,
    qfloat_base,
    true_division,
    tensorize=False,
    backend="limb",
    lowering=None,
):
    """Full inverse circuit body (reference qfloat_matrix_inversion.py:672-720).

    Input: ``(..., n*n, len)`` digit arrays + ``(..., n*n)`` signs.
    Output: ``(..., n*n, len+1)`` digit arrays with the sign appended.
    """
    _check_shapes(qfloat_arrays, n, qfloat_len)
    style = _resolve_lowering(lowering, n, packed_ok=(backend == "packed"))
    if backend != "packed" and lowering in ("scan", "vec", "fused"):
        # the scaled lowerings are built on the packed int64 magnitude
        # representation; a non-power-of-two base (or an encoding too wide
        # for int64) has only the unrolled limb path, whose graph grows
        # O(n^3) — fail loudly rather than silently unrolling
        raise ValueError(
            f"lowering='{lowering}' requires the packed backend (base=2^k "
            f"encoding that fits int64); backend='{backend}' only supports "
            "the 'unroll' lowering. See README 'Lowerings and bases'."
        )
    if backend == "packed" and style == "fused" or (
        backend == "packed" and n >= 3 and style in ("scan", "vec")
    ):
        # pack digits -> magnitudes, run the fixed-size scanned program or
        # the fused Pallas kernel, unpack back to the digit-array output
        # layout (bit-identical to the unrolled object path; see
        # models/qfloat_lu_scan.py and ops/fused_inverse.py)
        import jax.numpy as jnp

        from ..ops.packed import MAG_DTYPE, _digit_bits

        bits = _digit_bits(qfloat_base)
        L = qfloat_len
        place = jnp.asarray(
            [1 << (bits * (L - 1 - j)) for j in range(L)], MAG_DTYPE
        )
        mags = jnp.sum(jnp.asarray(qfloat_arrays, MAG_DTYPE) * place, axis=-1)
        if style == "fused":
            from ..ops.fused_inverse import fused_matrix_inverse as fn

            out_mags, out_signs = fn(
                mags, qfloat_signs, n, L, qfloat_ints, qfloat_base,
                true_division,
            )
        else:
            from .qfloat_lu_scan import (
                qfloat_matrix_inverse_scan,
                qfloat_matrix_inverse_vec,
            )

            fn = (
                qfloat_matrix_inverse_vec
                if style == "vec"
                else qfloat_matrix_inverse_scan
            )
            out_mags, out_signs = fn(
                mags, qfloat_signs, n, L, qfloat_ints, qfloat_base,
                true_division,
            )
        shifts = jnp.asarray([bits * (L - 1 - j) for j in range(L)], MAG_DTYPE)
        digits = (
            (out_mags[..., None] >> shifts) & (qfloat_base - 1)
        ).astype(jnp.int32)
        return jnp.concatenate(
            [digits, out_signs[..., None].astype(jnp.int32)], axis=-1
        )
    qfloat_M = qfloat_arrays_to_qfloat_matrix(
        qfloat_arrays, qfloat_signs, qfloat_ints, qfloat_base, backend
    )

    if n == 2:
        if tensorize:
            qfloat_Minv = qfloat_inverse_2x2_multi(qfloat_M, qfloat_len, qfloat_ints)
        else:
            qfloat_Minv = qfloat_inverse_2x2(qfloat_M, qfloat_len, qfloat_ints)
    else:
        bin_P, qfloat_L, qfloat_U = qfloat_lu_decomposition(
            qfloat_M, qfloat_len, qfloat_ints, true_division, tensorize
        )
        qfloat_Minv = qfloat_lu_inverse(
            bin_P, qfloat_L, qfloat_U, qfloat_len, qfloat_ints, true_division, tensorize
        )

    return qfloat_matrix_to_arrays_and_signs(
        qfloat_Minv, qfloat_len, qfloat_ints, qfloat_base
    )


# Auto lowering policy, grounded in on-chip v5e measurements
# (benchmarks/results/lowering.json, 65k batch, High preset; per-n fused
# figures re-measured round 5 with MARGINAL-rate timing — the fixed
# 5-80 ms tunnel sync is differenced out, utils/timing.timed_marginal —
# at a fixed 1M batch (n<=5) / 262k (n>=6), benchmarks/results/
# fused.json, 2026-08-21):
#   fused:  whole-inversion Pallas kernel (ops/fused_inverse.py) — 87.3M
#           n=4 High inversions/s dispatched, 121M device-only (94% of
#           the measured kernel-blend issue bound, results/roofline.json;
#           n=2 711M, n=3 145M, n=5 48.7M) vs the XLA unroll's ~25M
#           (HBM-traffic-bound; the kernel is VMEM-resident).
#           Auto-selected on single-chip TPU for n <= FUSED_MAX_N;
#           multi-device TPU processes get the shard_map form via
#           BatchedMatrixInversion(data_parallel) or
#           parallel.mesh.data_parallel_inverse_fused.
#   unroll: fastest XLA lowering through n=8 (874k vs vec's 682k at n=8)
#           but compile grows ~n^3 (149s at n=8, ~13 min at n=10);
#   vec:    fastest at n=9-12 (378k inv/s at n=10, compile 156s, O(n^2)
#           graph);
#   scan:   compile nearly flat in n (39s at n=10, 15s CPU at n=16) at
#           ~2x slower execution — the only practical choice for huge n.
# Large-n fused (262k batch, marginal rate, round 5): n=6 51.2M, n=7
# 24.2M, n=8 18.7M, n=9 14.6M, n=10 11.4M inv/s — 6.5x+ the best
# same-day XLA lowering (unroll n=8 2.86M compile 391s, n=10 1.34M
# compile 665s; lowering.json, round-4 chain timing) at roughly half the
# cold compile (140-300s, amortized by the persistent compilation
# cache).  Round-5 probe past the published sizes (131k batch): n=11
# 9.73M inv/s (compile 440s), n=12 7.65M (268s; cold-compile time is
# server-load-noisy, not strictly n^3) — 20x+ the vec/scan alternatives
# there, so auto picks fused through n=12 (= VEC_MAX_N) and hands to
# scan beyond; vec remains the auto choice at n=9-12 for contexts where
# fused is unavailable (CPU backend, multi-device jit).
FUSED_MAX_N = 12
UNROLL_MAX_N = 8
VEC_MAX_N = 12


def _fused_auto_ok():
    """Auto-pick the fused kernel only where it is known-good: a real TPU
    backend (Mosaic; CPU would fall back to the slow interpreter) and a
    single-device process (under jit-with-shardings XLA would have to
    partition the custom call; explicit lowering='fused' + shard_map still
    works multi-chip)."""
    import jax

    try:
        return jax.default_backend() not in ("cpu",) and jax.device_count() == 1
    except Exception:
        return False


def _resolve_lowering(lowering, n, packed_ok=False):
    if lowering in (None, "auto"):
        if packed_ok and n <= FUSED_MAX_N and _fused_auto_ok():
            return "fused"
        if n <= UNROLL_MAX_N:
            return "unroll"
        if n <= VEC_MAX_N:
            return "vec"
        return "scan"
    return lowering


def qfloat_matrix_inverse_packed_io(
    mags,
    signs,
    n,
    qfloat_len,
    qfloat_ints,
    qfloat_base,
    true_division,
    tensorize=False,
    vectorize_rows=None,
    lowering=None,
):
    """Full inverse with packed I/O: (..., n*n) int64 magnitudes + signs in,
    the same out.

    Production fast path: one magnitude word per cell instead of
    ``qfloat_len`` digit words on both sides of the circuit (40x less I/O
    and no per-cell pack/unpack stage at High precision).  Numerically
    identical to :func:`qfloat_matrix_inverse` on the packed backend.
    ``vectorize_rows`` runs the substitution phase with the output-row loop
    collapsed into a tensor axis (models/qfloat_lu_vec.py) — bit-identical
    results, n times fewer traced ops.  None = auto: on for n >= 6 (compile
    relief), off below (measured ~11% faster unvectorized at n=4 on v5e).
    ``lowering`` selects "unroll" (trace every op) vs "scan" (fixed-size
    lax.scan program, models/qfloat_lu_scan.py) vs "fused" (whole-inversion
    Pallas kernel, ops/fused_inverse.py) — bit-identical results;
    None/"auto" picks scan for n >= 8 where unrolled XLA compiles blow up.
    """
    style = _resolve_lowering(lowering, n, packed_ok=True)
    if style == "fused":
        from ..ops.fused_inverse import fused_matrix_inverse

        return fused_matrix_inverse(
            mags, signs, n, qfloat_len, qfloat_ints, qfloat_base, true_division
        )
    if n >= 3 and style in ("scan", "vec"):
        from .qfloat_lu_scan import (
            qfloat_matrix_inverse_scan,
            qfloat_matrix_inverse_vec,
        )

        fn = qfloat_matrix_inverse_vec if style == "vec" else qfloat_matrix_inverse_scan
        return fn(
            mags, signs, n, qfloat_len, qfloat_ints, qfloat_base, true_division
        )
    if vectorize_rows is None:
        vectorize_rows = n >= 6
    assert n * n == mags.shape[-1]
    qfloat_M = mags_and_signs_to_qfloat_matrix(
        mags, signs, qfloat_len, qfloat_ints, qfloat_base
    )
    if n == 2:
        if tensorize:
            qfloat_Minv = qfloat_inverse_2x2_multi(qfloat_M, qfloat_len, qfloat_ints)
        else:
            qfloat_Minv = qfloat_inverse_2x2(qfloat_M, qfloat_len, qfloat_ints)
    else:
        bin_P, qfloat_L, qfloat_U = qfloat_lu_decomposition(
            qfloat_M, qfloat_len, qfloat_ints, true_division, tensorize
        )
        if vectorize_rows:
            from .qfloat_lu_vec import qfloat_lu_inverse_vec

            qfloat_Minv = qfloat_lu_inverse_vec(
                bin_P, qfloat_L, qfloat_U, qfloat_len, qfloat_ints,
                true_division, tensorize,
            )
        else:
            qfloat_Minv = qfloat_lu_inverse(
                bin_P, qfloat_L, qfloat_U, qfloat_len, qfloat_ints,
                true_division, tensorize,
            )
    return qfloat_matrix_to_mags_and_signs(
        qfloat_Minv, qfloat_len, qfloat_ints, qfloat_base
    )


def qfloat_matrix_inverse_with_overflow(
    mags,
    signs,
    n,
    qfloat_len,
    qfloat_ints,
    qfloat_base,
    true_division,
    tensorize=False,
    lowering=None,
):
    """Packed-I/O inverse that also reports a per-matrix overflow flag.

    Implements the reference's open TODO (reference qfloat.py:255-257):
    overflow past the top digit — the documented main big-error source
    (reference README.md:119-121) — is detected at every normalization and
    OR-reduced into one int flag per batch element, so callers can reject
    or retry saturated results instead of silently consuming them.
    Returns ``(out_mags, out_signs, overflowed)``.

    All four lowerings support tracking with bit-identical flags
    (tests/test_overflow.py).  On the fused path the PairQFloat ops record
    into the same scope inside the Pallas kernel and the flag rides out as
    an extra kernel output; its multiplies use the windowed form inside the
    scope (the truncated form cannot expose the dropped carries), so
    tracking costs some fused throughput — measured on v5e, see
    benchmarks/results/fused.json — but far less than falling back to the
    XLA unroll lowering.
    """
    style = _resolve_lowering(lowering, n, packed_ok=True)
    if style == "fused":
        from ..ops.fused_inverse import fused_matrix_inverse

        return fused_matrix_inverse(
            mags, signs, n, qfloat_len, qfloat_ints, qfloat_base,
            true_division, track=True,
        )
    if n >= 3 and style in ("scan", "vec"):
        from .qfloat_lu_scan import (
            qfloat_matrix_inverse_scan,
            qfloat_matrix_inverse_vec,
        )

        fn = qfloat_matrix_inverse_vec if style == "vec" else qfloat_matrix_inverse_scan
        return fn(
            mags, signs, n, qfloat_len, qfloat_ints, qfloat_base,
            true_division, track=True,
        )
    from ..ops.packed import track_overflow

    with track_overflow() as tracker:
        out_mags, out_signs = qfloat_matrix_inverse_packed_io(
            mags, signs, n, qfloat_len, qfloat_ints, qfloat_base,
            true_division, tensorize, lowering="unroll",
        )
        flag = tracker.combined(mags.shape[:-1])
    return out_mags, out_signs, flag


def qfloat_pivot(qfloat_arrays, qfloat_signs, params, backend="limb"):
    """Pivot-only partial circuit (reference qfloat_matrix_inversion.py:592-609)."""
    [n, qfloat_len, qfloat_ints, qfloat_base, *_] = params
    _check_shapes(qfloat_arrays, n, qfloat_len)
    qfloat_M = qfloat_arrays_to_qfloat_matrix(
        qfloat_arrays, qfloat_signs, qfloat_ints, qfloat_base, backend
    )
    return qfloat_pivot_matrix(qfloat_M)


def qfloat_lu_L(qfloat_arrays, qfloat_signs, params, backend="limb"):
    """PLU partial circuit returning L (reference qfloat_matrix_inversion.py:612-639)."""
    [n, qfloat_len, qfloat_ints, qfloat_base, true_division, *_] = params
    _check_shapes(qfloat_arrays, n, qfloat_len)
    qfloat_M = qfloat_arrays_to_qfloat_matrix(
        qfloat_arrays, qfloat_signs, qfloat_ints, qfloat_base, backend
    )
    _, qfloat_L, _ = qfloat_lu_decomposition(
        qfloat_M, qfloat_len, qfloat_ints, true_division
    )
    return qfloat_matrix_to_arrays_and_signs(
        qfloat_L, qfloat_len, qfloat_ints, qfloat_base
    )


def qfloat_lu_U(qfloat_arrays, qfloat_signs, params, backend="limb"):
    """PLU partial circuit returning U (reference qfloat_matrix_inversion.py:642-669)."""
    [n, qfloat_len, qfloat_ints, qfloat_base, true_division, *_] = params
    _check_shapes(qfloat_arrays, n, qfloat_len)
    qfloat_M = qfloat_arrays_to_qfloat_matrix(
        qfloat_arrays, qfloat_signs, qfloat_ints, qfloat_base, backend
    )
    _, _, qfloat_U = qfloat_lu_decomposition(
        qfloat_M, qfloat_len, qfloat_ints, true_division
    )
    return qfloat_matrix_to_arrays_and_signs(
        qfloat_U, qfloat_len, qfloat_ints, qfloat_base
    )
