"""Same-process A/B: bench.py's API path vs cmd_fused's direct-jit path.

Round-4 verdict weak #3: the driver's bench.py recorded 61.0M n=4 High
inversions/s while the fused sweep recorded 73.3M the same day.  A 1.3%
within-run spread can't explain a 17% gap, so either the chip window
drifted between the two processes or the API path is structurally slower.
This script times both paths INTERLEAVED in one process (A, B, A, B, ...)
so any chip-window drift hits both equally.  Writes
results/ab_bench_vs_sweep.json.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from matrix_inversion_tpu import HIGH
    from matrix_inversion_tpu.models.inverse import qfloat_matrix_inverse_packed_io
    from matrix_inversion_tpu.runtime.api import BatchedMatrixInversion

    batch = int(os.environ.get("AB_BATCH", 1 << 20))
    reps = int(os.environ.get("AB_REPS", 10))
    rounds = int(os.environ.get("AB_ROUNDS", 4))

    p = HIGH.replace(n=4)
    inv = BatchedMatrixInversion(p, batch, backend="packed", io="packed")

    direct = jax.jit(
        functools.partial(
            qfloat_matrix_inverse_packed_io,
            n=p.n,
            qfloat_len=p.qfloat_len,
            qfloat_ints=p.qfloat_ints,
            qfloat_base=p.qfloat_base,
            true_division=p.true_division,
            lowering="fused",
        )
    )

    rng = np.random.RandomState(0)
    M = rng.randn(batch, 4, 4) * 100
    mags, signs = inv.quantize(M)
    m = jax.device_put(jnp.asarray(mags))
    s = jax.device_put(jnp.asarray(signs))

    def fence(st):
        jax.block_until_ready(st)
        return np.asarray(st[0][0, 0])

    def chain(step, state):
        t0 = time.time()
        for _ in range(reps):
            state = step(state)
        fence(state)
        return time.time() - t0

    paths = {
        "api_run_raw": lambda st: inv.run_raw(*st),
        "direct_jit_fused": lambda st: direct(st[0], st[1])[:2],
    }
    # warm both
    for name, step in paths.items():
        fence(step((m, s)))

    results = {name: [] for name in paths}
    for r in range(rounds):
        for name, step in paths.items():
            el = chain(step, (m, s))
            rate = batch * reps / el
            results[name].append(rate)
            print(f"round {r} {name}: {rate/1e6:.1f}M inv/s", flush=True)

    out = {
        "batch": batch,
        "reps": reps,
        "rounds": rounds,
        "device_kind": jax.devices()[0].device_kind,
        "date": time.strftime("%Y-%m-%d"),
    }
    for name, rates in results.items():
        out[name] = {
            "median_inversions_per_s": round(float(np.median(rates)), 1),
            "min": round(float(np.min(rates)), 1),
            "max": round(float(np.max(rates)), 1),
            "all": [round(float(x), 1) for x in rates],
        }
    ratio = (
        out["direct_jit_fused"]["median_inversions_per_s"]
        / out["api_run_raw"]["median_inversions_per_s"]
    )
    out["direct_over_api_ratio"] = round(ratio, 4)
    path = os.path.join(os.path.dirname(__file__), "results", "ab_bench_vs_sweep.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
