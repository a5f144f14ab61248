"""Root-cause analysis of the precision sweep's big-error outliers.

Round-1 verdict item 2: the committed precision table shows nonzero
big-error rates at High precision (n=2: 0.04%, n=5: 0.03% incl. a 65878
outlier, n=10: 0.01%) where the reference README reports 0.0%
(reference README.md:90-99).  This script settles whether those are
framework bugs or irreducible near-singular draws:

  1. re-runs the seeded sweep and extracts every sample with error > 1;
  2. for each outlier, runs the LIVE reference clear path
     (via tests/ref_shim.py) on the SAME matrix and compares errors;
  3. records the condition number and the overflow flag from
     qfloat_matrix_inverse_with_overflow (the reference's open TODO,
     reference qfloat.py:255-257, implemented here);
  4. writes benchmarks/results/outliers.json.

Expected conclusion (verified by tests/test_outlier_parity.py): the
reference produces the IDENTICAL wrong digits on every outlier matrix —
the big errors are a property of the shared exact-QFloat algorithm on
near-singular / overflowing draws, and the README's 0.0% is a different
random stream, not better arithmetic.

Usage: python benchmarks/outlier_analysis.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def find_outliers(params, N, seed=0, batch_size=2048, threshold=1.0):
    """Re-run the seeded precision sweep, return (matrices, errors, flags)."""
    import jax
    import jax.numpy as jnp

    from matrix_inversion_tpu.models.inverse import (
        qfloat_matrix_inverse_with_overflow,
    )
    from matrix_inversion_tpu.models.marshal import (
        float_matrix_to_mags_and_signs,
        mags_and_signs_to_float_matrix,
    )

    p = params
    rng = np.random.RandomState(seed)

    fn = jax.jit(
        functools.partial(
            qfloat_matrix_inverse_with_overflow,
            n=p.n,
            qfloat_len=p.qfloat_len,
            qfloat_ints=p.qfloat_ints,
            qfloat_base=p.qfloat_base,
            true_division=p.true_division,
        )
    )

    out_Ms, out_errs, out_flags = [], [], []
    done = 0
    while done < N:
        b = min(batch_size, N - done)
        M = rng.standard_normal((b, p.n, p.n)) * 100
        mags, signs = float_matrix_to_mags_and_signs(
            M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
        )
        om, os_, flag = fn(jnp.asarray(mags), jnp.asarray(signs))
        inv = mags_and_signs_to_float_matrix(
            np.asarray(om), np.asarray(os_), p.qfloat_len, p.qfloat_ints, p.qfloat_base
        )
        err = np.mean(np.abs(inv - np.linalg.inv(M)), axis=(1, 2))
        bad = err > threshold
        out_Ms.append(M[bad])
        out_errs.append(err[bad])
        out_flags.append(np.asarray(flag)[bad])
        done += b
        print(f"  {done}/{N}: {int(np.sum(bad))} outliers in this batch", flush=True)
    return (
        np.concatenate(out_Ms),
        np.concatenate(out_errs),
        np.concatenate(out_flags),
    )


def reference_error(M, qlen, qints, base, true_division):
    """Run the LIVE reference clear path on M, return (error, float inverse)."""
    import ref_shim

    ref = ref_shim.load_reference()
    if ref is None:
        return None, None
    arrays, signs = ref.qmi.float_matrix_to_qfloat_arrays(M, qlen, qints, base)
    out = ref.qmi.qfloat_matrix_inverse(
        arrays, signs, M.shape[0], qlen, qints, base, true_division
    )
    inv = ref.qmi.qfloat_and_signs_arrays_to_float_matrix(out, qints, base)
    return float(np.mean(np.abs(inv - np.linalg.inv(M)))), inv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="N=2000 instead of 10000")
    ap.add_argument("--ns", type=int, nargs="+", default=[2, 5, 10])
    args = ap.parse_args()

    from matrix_inversion_tpu import HIGH

    N = 2000 if args.quick else 10000
    results = {}
    for n in args.ns:
        p = HIGH.replace(n=n)
        print(f"== high/n={n}, N={N}")
        Ms, errs, flags = find_outliers(p, N)
        entries = []
        for M, err, flag in zip(Ms, errs, flags):
            ref_err, _ = reference_error(
                M, p.qfloat_len, p.qfloat_ints, p.qfloat_base, p.true_division
            )
            cond = float(np.linalg.cond(M))
            entries.append(
                {
                    "our_error": float(err),
                    "reference_error": ref_err,
                    "condition_number": cond,
                    "overflow_flagged": bool(flag),
                    "matrix": M.tolist(),
                }
            )
            print(
                f"  outlier: our={err:.4g} ref={ref_err:.4g} "
                f"cond={cond:.3g} overflow={bool(flag)}"
            )
        results[f"high/n={n}"] = {
            "N": N,
            "n_outliers": len(entries),
            "big_error_rate_pct": 100.0 * len(entries) / N,
            "outliers": entries,
        }

    out_path = os.path.join(
        os.path.dirname(__file__), "results", "outliers.json"
    )
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            merged = json.load(fh)
    merged.update(results)
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=2)
    results = merged
    print(f"wrote {out_path}")

    # summary verdict
    for key, r in results.items():
        n_match = sum(
            1
            for e in r["outliers"]
            if e["reference_error"] is not None
            and abs(e["reference_error"] - e["our_error"]) <= 1e-6 * max(1.0, e["our_error"])
        )
        flagged = sum(1 for e in r["outliers"] if e["overflow_flagged"])
        print(
            f"{key}: {r['n_outliers']} outliers / {r['N']}; "
            f"reference reproduces {n_match}/{r['n_outliers']}; "
            f"overflow-flagged {flagged}/{r['n_outliers']}"
        )


if __name__ == "__main__":
    main()
