"""Worker process for the localhost 2-process jax.distributed test.

Launched by tests/test_distributed.py:  one process per "host", each with 4
virtual CPU devices, joined into one jax.distributed cluster — the exact
code path (initialize_distributed -> host_local_slice ->
global_batch_arrays -> dp program) the multi-host deployment uses, minus
real DCN.

Usage: python dist_worker.py <pid> <nproc> <port> <outdir>
"""

import json
import os
import sys


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import PartitionSpec as P

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from matrix_inversion_tpu import LOW
    from matrix_inversion_tpu.models.marshal import float_matrix_to_qfloat_arrays
    from matrix_inversion_tpu.parallel.distributed import (
        global_batch_arrays,
        host_local_slice,
        initialize_distributed,
    )
    from matrix_inversion_tpu.parallel.mesh import data_parallel_inverse, make_mesh

    assert initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc  # global devices
    assert len(jax.local_devices()) == 4

    params = LOW.replace(n=3)
    B = 16
    rng = np.random.RandomState(0)  # same stream on every process
    M = rng.randn(B, 3, 3) * 100
    digits, signs = float_matrix_to_qfloat_arrays(
        M, params.qfloat_len, params.qfloat_ints, params.qfloat_base
    )

    mesh = make_mesh()
    start, size = host_local_slice(B, mesh)
    gd = global_batch_arrays(digits[start : start + size], mesh, P("data", None, None))
    gs = global_batch_arrays(signs[start : start + size], mesh, P("data", None))
    assert gd.shape == (B, 9, params.qfloat_len), gd.shape

    fn = data_parallel_inverse(params, mesh, backend="packed")
    out = fn(gd, gs)
    jax.block_until_ready(out)

    # save this process's addressable shards with their global batch offsets
    shards = {}
    for s in out.addressable_shards:
        b0 = s.index[0].start or 0
        shards[str(b0)] = np.asarray(s.data)
    np.savez(os.path.join(outdir, f"out_{pid}.npz"), **shards)
    with open(os.path.join(outdir, f"meta_{pid}.json"), "w") as fh:
        json.dump({"start": start, "size": size, "ok": True}, fh)
    print(f"worker {pid}: ok", flush=True)


if __name__ == "__main__":
    main()
