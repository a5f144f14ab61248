"""Fused whole-inversion kernel: bit-exactness vs the unrolled lowering.

Two layers of proof:
* ``fused_inverse_body`` (the kernel body as a pure jnp function) is run
  eagerly against the packed unrolled circuit — full digit/sign equality
  across presets and sizes, fast enough for the core tier;
* the actual ``pallas_call`` plumbing (tiling, padding, chunking via
  lax.map) runs in interpret mode on a small case (slow tier: interpret
  mode executes the ~20k-op kernel body op by op).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from matrix_inversion_tpu import HIGH, LOW, MEDIUM
from matrix_inversion_tpu.models.inverse import qfloat_matrix_inverse_packed_io
from matrix_inversion_tpu.models.marshal import float_matrix_to_qfloat_arrays
from matrix_inversion_tpu.ops import pair_math as pm
from matrix_inversion_tpu.ops import radix
from matrix_inversion_tpu.ops.fused_inverse import (
    fused_inverse_body,
    fused_matrix_inverse,
)


def quantize(p, n, B, seed):
    rng = np.random.RandomState(seed)
    M = rng.randn(B, n, n) * 100
    digits, signs = float_matrix_to_qfloat_arrays(
        M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
    )
    mags = jnp.asarray(radix.pack_digits(digits, p.qfloat_base))
    return mags, jnp.asarray(signs)


def unroll_reference(p, n, mags, signs):
    return qfloat_matrix_inverse_packed_io(
        mags, signs, n, p.qfloat_len, p.qfloat_ints, p.qfloat_base,
        p.true_division, lowering="unroll",
    )


@pytest.mark.parametrize(
    "preset,n",
    [(HIGH, 2), (HIGH, 3), (HIGH, 4), (HIGH, 5), (LOW, 4), (MEDIUM, 3)],
)
def test_fused_body_bit_exact(preset, n):
    p = preset.replace(n=n)
    mags, signs = quantize(p, n, 64, seed=n)
    ref_m, ref_s = unroll_reference(p, n, mags, signs)

    n2 = n * n
    hi, lo = pm.split64(jnp.moveaxis(mags, -1, 0))
    sg = jnp.moveaxis(signs, -1, 0).astype(jnp.int32)
    ohi, olo, osg = fused_inverse_body(
        [hi[i] for i in range(n2)],
        [lo[i] for i in range(n2)],
        [sg[i] for i in range(n2)],
        n, p.qfloat_len, p.qfloat_ints, p.qfloat_base, p.true_division,
    )
    got_m = np.stack(
        [np.asarray(pm.join64(h, l).astype(jnp.int64)) for h, l in zip(ohi, olo)],
        axis=-1,
    )
    got_s = np.stack([np.asarray(s) for s in osg], axis=-1).astype(np.int64)
    np.testing.assert_array_equal(np.asarray(ref_m), got_m)
    np.testing.assert_array_equal(np.asarray(ref_s), got_s)


def test_fused_body_singular_saturates():
    """Singular matrices run the division-by-zero saturation path."""
    p = LOW.replace(n=3)
    rng = np.random.RandomState(0)
    M = rng.randn(8, 3, 3)
    M[:, 2, :] = M[:, 0, :] + M[:, 1, :]  # rank-deficient
    digits, signs = float_matrix_to_qfloat_arrays(
        M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
    )
    mags = jnp.asarray(radix.pack_digits(digits, p.qfloat_base))
    signs = jnp.asarray(signs)
    ref_m, ref_s = unroll_reference(p, 3, mags, signs)
    got_m, got_s = fused_matrix_inverse(
        mags, signs, 3, p.qfloat_len, p.qfloat_ints, p.qfloat_base,
        p.true_division, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref_m), np.asarray(got_m))
    np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(got_s))


@pytest.mark.slow
def test_fused_pallas_interpret_tiling():
    """pallas_call plumbing: padding + multi-chunk lax.map, interpret mode."""
    p = LOW.replace(n=3)
    # B chosen to force padding (not a multiple of 8*128) and >= 2 chunks
    B = 3 * 8 * 128 + 17
    mags, signs = quantize(p, 3, B, seed=1)
    ref_m, ref_s = unroll_reference(p, 3, mags, signs)
    got_m, got_s = fused_matrix_inverse(
        mags, signs, 3, p.qfloat_len, p.qfloat_ints, p.qfloat_base,
        p.true_division, tile_rows=16, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref_m), np.asarray(got_m))
    np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(got_s))


def test_fused_lowering_wiring():
    """lowering='fused' routes through the packed-io entry point."""
    p = LOW.replace(n=2)
    mags, signs = quantize(p, 2, 8, seed=2)
    ref_m, ref_s = unroll_reference(p, 2, mags, signs)
    got_m, got_s = qfloat_matrix_inverse_packed_io(
        mags, signs, 2, p.qfloat_len, p.qfloat_ints, p.qfloat_base,
        p.true_division, lowering="fused",
    )
    np.testing.assert_array_equal(np.asarray(ref_m), np.asarray(got_m))
    np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(got_s))
