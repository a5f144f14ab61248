"""Small-n binder experiments: dispatch overhead vs device time (round-5).

The round-4 open question: n=2 measures 226M inv/s vs a ~538M measured-rate
roofline, n=3 99.5M vs ~186M — where do the missing factors live?  A real
device trace (jax.profiler, vm.trace.json.gz) shows, per lax.map chunk
iteration at n=2: kernel 2.8us, dynamic-slice/update-slice fusions ~2.4us —
and a whole-program device span of ~1.5ms/rep against a 4.4ms/rep measured
wall.  This script separates the three suspects:

  A. per-HOST-DISPATCH overhead (tunnel): wall(reps) slope vs an
     IN-PROGRAM lax.fori_loop chain of the same work (one dispatch);
  B. lax.map slice/update glue: in-kernel rate with the loop body timed
     via fori_loop differencing (K=low vs K=high cancels fixed cost);
  C. the kernel itself.

Writes results/trace_smalln.json.
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
    from jax import lax

    import matrix_inversion_tpu as mi
    from matrix_inversion_tpu.models.inverse import qfloat_matrix_inverse_packed_io
    from matrix_inversion_tpu.models.marshal import float_matrix_to_mags_and_signs

    batch = int(os.environ.get("TR_BATCH", 1 << 20))
    sizes = tuple(
        int(s) for s in os.environ.get("TR_SIZES", "2,3,4").split(",")
    )
    out = {
        "batch": batch,
        "device_kind": jax.devices()[0].device_kind,
        "date": time.strftime("%Y-%m-%d"),
    }
    path = os.path.join(os.path.dirname(__file__), "results",
                        "trace_smalln.json")
    if os.path.exists(path):  # merge: keep other sizes' entries
        with open(path) as fh:
            prior = json.load(fh)
        prior.update(out)
        out = prior

    for n in sizes:
        p = mi.HIGH.replace(n=n)
        body = functools.partial(
            qfloat_matrix_inverse_packed_io,
            n=n,
            qfloat_len=p.qfloat_len,
            qfloat_ints=p.qfloat_ints,
            qfloat_base=p.qfloat_base,
            true_division=p.true_division,
            lowering="fused",
        )
        fn = jax.jit(lambda m, s: body(m, s)[:2])

        rng = np.random.RandomState(0)
        M = rng.randn(batch, n, n) * 100
        mags, signs = float_matrix_to_mags_and_signs(
            M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
        )
        m = jax.device_put(jnp.asarray(mags, jnp.int64))
        s = jax.device_put(jnp.asarray(signs, jnp.int64))

        def fence(st):
            jax.block_until_ready(st)
            return np.asarray(st[0][0, 0])

        fence(fn(m, s))  # warm

        # A: host-dispatched chain at several rep counts -> slope = per-rep
        # wall cost incl. any per-dispatch overhead
        dispatched = {}
        for reps in (5, 10, 20, 40):
            best = None
            for _ in range(3):
                st = (m, s)
                t0 = time.time()
                for _ in range(reps):
                    st = fn(*st)
                fence(st)
                el = time.time() - t0
                best = el if best is None else min(best, el)
            dispatched[reps] = best
            print(f"n={n} dispatched reps={reps}: {best*1e3:.2f}ms "
                  f"({batch*reps/best/1e6:.1f}M inv/s)", flush=True)
        # least-squares slope of wall vs reps
        xs = np.array(sorted(dispatched))
        ys = np.array([dispatched[x] for x in xs])
        slope, intercept = np.polyfit(xs, ys, 1)

        # B: in-program chain: one dispatch runs K reps via lax.fori_loop;
        # difference two K values to cancel the fixed dispatch/glue cost
        @functools.partial(jax.jit, static_argnums=2)
        def chained(m, s, k):
            def step(_, st):
                return body(st[0], st[1])[:2]
            return lax.fori_loop(0, k, step, (m, s))

        inprog = {}
        for k in (4, 16):
            fence(chained(m, s, k))  # warm/compile
            best = None
            for _ in range(3):
                t0 = time.time()
                fence(chained(m, s, k))
                el = time.time() - t0
                best = el if best is None else min(best, el)
            inprog[k] = best
            print(f"n={n} in-program K={k}: {best*1e3:.2f}ms", flush=True)
        device_per_rep = (inprog[16] - inprog[4]) / 12.0
        out[f"n={n}"] = {
            "dispatched_wall_s": {str(k): round(v, 5) for k, v in dispatched.items()},
            "dispatched_per_rep_s": round(float(slope), 6),
            "dispatched_fixed_s": round(float(intercept), 6),
            "dispatched_rate_M": round(batch / slope / 1e6, 1),
            "inprogram_wall_s": {str(k): round(v, 5) for k, v in inprog.items()},
            "device_per_rep_s": round(float(device_per_rep), 6),
            "device_rate_M": round(batch / device_per_rep / 1e6, 1),
            "dispatch_overhead_per_rep_ms": round(
                (slope - device_per_rep) * 1e3, 3
            ),
        }
        print(f"n={n}: dispatched {out[f'n={n}']['dispatched_rate_M']}M inv/s, "
              f"device-only {out[f'n={n}']['device_rate_M']}M inv/s, "
              f"overhead {out[f'n={n}']['dispatch_overhead_per_rep_ms']}ms/rep",
              flush=True)

    path = os.path.join(os.path.dirname(__file__), "results", "trace_smalln.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
