"""HIGH n=4 fused-under-shard_map on the REAL TPU mesh.

The CPU-mesh dryrun cannot afford the flagship HIGH n=4 fused kernel in
interpret mode (minutes-to-tens-of-minutes on XLA:CPU, see
__graft_entry__.py), so this script covers that combination on real
hardware: it builds ``data_parallel_inverse_fused`` (shard_map around the
whole-inversion Pallas kernel) over a mesh of ALL available TPU devices,
runs it, and asserts bit-equality against the direct (unsharded) fused
kernel.  Appends the result to benchmarks/results/scaling.json.

Run: ``python benchmarks/shardmap_tpu_check.py`` (on the TPU host).
"""

import datetime
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                       "scaling.json")


def main():
    import jax
    import jax.numpy as jnp

    import matrix_inversion_tpu as mi
    from matrix_inversion_tpu.models.marshal import float_matrix_to_mags_and_signs
    from matrix_inversion_tpu.ops.fused_inverse import fused_matrix_inverse
    from matrix_inversion_tpu.parallel.mesh import (
        data_parallel_inverse_fused,
        make_mesh,
    )

    assert jax.devices()[0].platform != "cpu", "run on the TPU host"
    n_dev = len(jax.devices())
    p = mi.HIGH.replace(n=4)
    B = 65536 * n_dev
    rng = np.random.RandomState(0)
    M = rng.randn(B, 4, 4) * 100
    mags, signs = float_matrix_to_mags_and_signs(
        M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
    )
    m = jnp.asarray(mags)
    s = jnp.asarray(signs)

    mesh = make_mesh(n_dev, axis_names=("data",))
    t0 = time.time()
    fn = data_parallel_inverse_fused(p, mesh)
    sm_m, sm_s = fn(m, s)
    jax.block_until_ready((sm_m, sm_s))
    compile_run_s = time.time() - t0

    ref_m, ref_s = jax.jit(
        lambda a, b: fused_matrix_inverse(
            a, b, p.n, p.qfloat_len, p.qfloat_ints, p.qfloat_base,
            p.true_division,
        )
    )(m, s)
    np.testing.assert_array_equal(np.asarray(sm_m), np.asarray(ref_m))
    np.testing.assert_array_equal(np.asarray(sm_s), np.asarray(ref_s))

    entry = {
        "program": "data_parallel_inverse_fused (shard_map + Pallas kernel)",
        "config": "high/n=4",
        "devices": n_dev,
        "batch": B,
        "bit_exact_vs_unsharded_fused": True,
        "compile_plus_first_run_s": round(compile_run_s, 1),
        "date": datetime.date.today().isoformat(),
        "device_kind": getattr(jax.devices()[0], "device_kind", "tpu"),
    }
    results = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as fh:
            results = json.load(fh)
    results["fused_shard_map_high_n4_tpu"] = entry
    with open(RESULTS, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(entry))
    print("wrote", RESULTS)


if __name__ == "__main__":
    main()
