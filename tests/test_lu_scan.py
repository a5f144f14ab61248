"""Scanned-lowering parity tests (models/qfloat_lu_scan.py).

The scanned path must be bit-identical to the unrolled packed-I/O path —
magnitudes, signs, AND overflow flags — across precisions, true_division,
sign-0 inputs, and out-of-range (overflowing) inputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matrix_inversion_tpu.models.inverse import (
    qfloat_matrix_inverse_packed_io,
    qfloat_matrix_inverse_with_overflow,
)
from matrix_inversion_tpu.models.qfloat_lu_scan import (
    qfloat_matrix_inverse_scan,
    qfloat_matrix_inverse_vec,
)
from matrix_inversion_tpu.models.marshal import (
    float_matrix_to_mags_and_signs,
    mags_and_signs_to_float_matrix,
)

LOWERINGS = {"scan": qfloat_matrix_inverse_scan, "vec": qfloat_matrix_inverse_vec}

CASES = [
    # (n, len, ints, true_division, scale)
    (3, 23, 9, False, 10.0),
    (3, 23, 9, True, 10.0),
    (4, 31, 16, False, 100.0),
    (4, 31, 16, True, 100.0),
    (5, 40, 20, True, 100.0),
    (3, 40, 20, False, 1.0),
    # out-of-range inputs: quantization does not crop, overflow paths fire
    (3, 23, 9, False, 2000.0),
    (4, 23, 9, True, 5000.0),
]


def _quantized(rng, B, n, L, I, scale):
    M = rng.randn(B, n, n) * scale
    M[rng.rand(B, n, n) < 0.15] = 0.0  # exercise sign-0 cells
    mags, signs = float_matrix_to_mags_and_signs(M, L, I, 2)
    return M, jnp.asarray(mags), jnp.asarray(signs)


# core tier: the smallest case per lowering; the full CASES sweep is slow
_CASES_TIERED = [CASES[0]] + [
    pytest.param(*c, marks=pytest.mark.slow) for c in CASES[1:]
]


@pytest.mark.parametrize("style", sorted(LOWERINGS))
@pytest.mark.parametrize("n,L,I,td,scale", _CASES_TIERED)
def test_scan_bit_exact_vs_unrolled(rng, n, L, I, td, scale, style):
    fn = LOWERINGS[style]
    _, mags, signs = _quantized(rng, 24, n, L, I, scale)
    um, us = jax.jit(
        lambda m, s: qfloat_matrix_inverse_packed_io(
            m, s, n, L, I, 2, td, lowering="unroll"
        )
    )(mags, signs)
    sm, ss = jax.jit(lambda m, s: fn(m, s, n, L, I, 2, td))(mags, signs)
    np.testing.assert_array_equal(np.asarray(um), np.asarray(sm))
    np.testing.assert_array_equal(np.asarray(us), np.asarray(ss))


@pytest.mark.slow
@pytest.mark.parametrize("style", sorted(LOWERINGS))
@pytest.mark.parametrize("n,L,I,td,scale", CASES)
def test_scan_overflow_flags_match(rng, n, L, I, td, scale, style):
    fn = LOWERINGS[style]
    _, mags, signs = _quantized(rng, 24, n, L, I, scale)
    um, us, uf = jax.jit(
        lambda m, s: qfloat_matrix_inverse_with_overflow(
            m, s, n, L, I, 2, td, lowering="unroll"
        )
    )(mags, signs)
    sm, ss, sf = jax.jit(
        lambda m, s: fn(m, s, n, L, I, 2, td, track=True)
    )(mags, signs)
    np.testing.assert_array_equal(np.asarray(um), np.asarray(sm))
    np.testing.assert_array_equal(np.asarray(us), np.asarray(ss))
    np.testing.assert_array_equal(np.asarray(uf), np.asarray(sf))


@pytest.mark.slow
def test_scan_large_n_compiles_and_inverts(rng):
    # the whole point of the scanned lowering: large n compiles in seconds
    n, L, I = 8, 40, 20
    M, mags, signs = _quantized(rng, 16, n, L, I, 10.0)
    # keep matrices invertible / well-conditioned for the error check
    M = rng.randn(16, n, n) * 10 + np.eye(n) * 20
    mags, signs = map(jnp.asarray, float_matrix_to_mags_and_signs(M, L, I, 2))
    sm, ss = jax.jit(
        lambda m, s: qfloat_matrix_inverse_scan(m, s, n, L, I, 2, True)
    )(mags, signs)
    inv = mags_and_signs_to_float_matrix(np.asarray(sm), np.asarray(ss), L, I, 2)
    assert np.max(np.abs(inv - np.linalg.inv(M))) < 1e-2


@pytest.mark.slow
def test_auto_lowering_routes_large_n(rng):
    # packed_io with default lowering routes n=9..12 to the vec path and
    # n>12 to the scanned path; results must match the explicit calls
    from matrix_inversion_tpu.models.inverse import _resolve_lowering

    assert _resolve_lowering(None, 4) == "unroll"
    assert _resolve_lowering("auto", 10) == "vec"
    assert _resolve_lowering("auto", 14) == "scan"
    assert _resolve_lowering("unroll", 14) == "unroll"

    n, L, I = 9, 31, 16
    _, mags, signs = _quantized(rng, 8, n, L, I, 10.0)
    am, asg = jax.jit(
        lambda m, s: qfloat_matrix_inverse_packed_io(m, s, n, L, I, 2, False)
    )(mags, signs)
    sm, ss = jax.jit(
        lambda m, s: qfloat_matrix_inverse_vec(m, s, n, L, I, 2, False)
    )(mags, signs)
    np.testing.assert_array_equal(np.asarray(am), np.asarray(sm))
    np.testing.assert_array_equal(np.asarray(asg), np.asarray(ss))


@pytest.mark.slow
def test_scan_digits_io_parity(rng):
    # the digits-I/O circuit body also routes through the scanned lowering
    # (packs digits -> magnitudes -> scan -> unpack) and must be
    # bit-identical to the unrolled object path
    from matrix_inversion_tpu.models.inverse import qfloat_matrix_inverse
    from matrix_inversion_tpu.models.marshal import float_matrix_to_qfloat_arrays

    n, L, I, td = 4, 31, 16, True
    B = 12
    M = rng.randn(B, n, n) * 50
    M[rng.rand(B, n, n) < 0.1] = 0.0
    d, s = map(jnp.asarray, float_matrix_to_qfloat_arrays(M, L, I, 2))
    a = jax.jit(
        lambda d, s: qfloat_matrix_inverse(
            d, s, n, L, I, 2, td, backend="packed", lowering="unroll"
        )
    )(d, s)
    b = jax.jit(
        lambda d, s: qfloat_matrix_inverse(
            d, s, n, L, I, 2, td, backend="packed", lowering="scan"
        )
    )(d, s)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_scan_via_batched_api(rng):
    from matrix_inversion_tpu.config import MEDIUM
    from matrix_inversion_tpu.runtime.api import BatchedMatrixInversion

    params = MEDIUM.replace(n=4, lowering="scan")
    B = 8
    inv = BatchedMatrixInversion(params, B, backend="packed", io="packed")
    M = rng.randn(B, 4, 4) * 50 + np.eye(4) * 10
    out = inv.run(M)
    assert np.max(np.abs(out - np.linalg.inv(M))) < 1e-2

    ref = BatchedMatrixInversion(
        params.replace(lowering="unroll"), B, backend="packed", io="packed"
    )
    np.testing.assert_array_equal(out, ref.run(M))


@pytest.mark.slow
def test_scan_under_batch_sharding(rng):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n, L, I = 4, 31, 16
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    _, mags, signs = _quantized(rng, 32, n, L, I, 10.0)
    sh = NamedSharding(mesh, P("data"))
    mags_s = jax.device_put(mags, sh)
    signs_s = jax.device_put(signs, sh)
    f = jax.jit(
        lambda m, s: qfloat_matrix_inverse_scan(m, s, n, L, I, 2, False),
        in_shardings=(sh, sh),
        out_shardings=(sh, sh),
    )
    sm, ss = f(mags_s, signs_s)
    um, us = jax.jit(
        lambda m, s: qfloat_matrix_inverse_packed_io(
            m, s, n, L, I, 2, False, lowering="unroll"
        )
    )(mags, signs)
    np.testing.assert_array_equal(np.asarray(um), np.asarray(sm))
    np.testing.assert_array_equal(np.asarray(us), np.asarray(ss))
