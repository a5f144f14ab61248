"""VPU primitive-throughput microbenchmark (Pallas, grid-free).

Measures elem-ops/s per primitive mix inside a straight-line Mosaic kernel
— the calibration source for the measured-rate roofline
(utils/roofline.py:kernel_roofline).  Methodology:

* every iteration is a mutual recurrence ``x = op(x, y); y = op(y, x)``
  (Fibonacci-style data flow) — algebraically foldable chains like
  ``x = x + y`` repeated K times collapse to ``x + K*y`` at compile time
  and measure nothing;
* two K values are timed and differenced, cancelling launch overhead and
  the VMEM load/store of inputs/outputs;
* C independent chains per kernel separate throughput from dependency
  latency.

Measured on v5e (2026-08 round 3, see benchmarks/results/roofline.json):
u32 add 1.50 T/s, u32 mul 1.95 T/s, mul+add mix 2.53 T/s, shift/xor/add
mix 2.33 T/s, cmp/xor/select/add mix 1.94 T/s.  Re-measured 2026-08-21
(round 4): add 1.57 T/s, mul 1.69 T/s, mul+add 1.58 T/s — the rate is now
FLAT ~1.6 T/s across mixes on the current runtime; the 2.5 T mixed rate
did not reproduce.  Either way the practical issue rate is FAR below the
8*128*4*0.94e9 ~ 3.85 T/s four-ALU figure sometimes quoted: a
straight-line int kernel averages ~1.3-1.7 ops/cycle/lane-slot.
Cross-day rates drift with runtime updates — recalibrate before quoting
an MFU.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
U32 = jnp.uint32


def it_add(x, y):          # 2 adds
    x = x + y
    y = y + x
    return x, y, 2


def it_mul(x, y):          # 2 muls
    x = x * y
    y = y * x
    return x, y, 2


def it_muladd(x, y):       # 1 mul + 1 add
    x = x * y
    y = y + x
    return x, y, 2


def it_shxor(x, y):        # shr + xor + add
    x = (x >> U32(7)) ^ y
    y = y + x
    return x, y, 3


def it_sel(x, y):          # cmp + xor + select + add
    x = jnp.where(x > y, x ^ y, y)
    y = y + x
    return x, y, 4


def it_f32(x, y):          # 2 f32 muls
    x = x * y
    y = y * x
    return x, y, 2


def it_maskand(x, y):      # 2 adds + 1 constant-mask and (kernel pattern)
    x = (x + y) & U32(0x3FFFFFFF)
    y = y + x
    return x, y, 3


def it_convert(x, y):      # 2 adds + 2 u32<->i32 converts (kernel pattern)
    x = (x.astype(jnp.int32) + y.astype(jnp.int32)).astype(U32)
    y = y + x
    return x, y, 4


def it_kernelmix(x, y):
    """~n=4 fused-kernel primitive proportions, nominal 20 ops/iter.

    Mirrors utils/roofline.kernel_op_histogram(n=4): and 23% / sub 14% /
    add 14% / convert 9% / shr 9% / shl 9% / mul 5% / or 5% / cmp+sel 9%,
    with shifts and masks by CONSTANTS exactly as the kernel emits them.
    The measured rate of this chain (counting every nominal op, converts
    included) is the empirical issue bound for the kernel's op blend.
    """
    a = x & U32(0xFFFF)                          # and
    b = (y >> U32(16)) & U32(0x7FFF)             # shr, and
    c = (a * b) & U32(0x3FFFFFFF)                # mul, and
    d = (x - y) + (c - b)                        # sub, add, sub
    e = (c << U32(3)) | (d >> U32(5))            # shl, or, shr
    f = (e.astype(jnp.int32) - jnp.int32(7)).astype(U32)  # convert, sub, convert
    g = jnp.where(x < y, f, e)                   # lt, select
    x = ((g + a) ^ (g << U32(1))) & U32(0x7FFFFFFF)       # add, xor, shl, and
    y = y + x                                    # add
    return x, y, 22


MIXES = {
    "u32_add": (it_add, U32),
    "u32_mul": (it_mul, U32),
    "u32_muladd": (it_muladd, U32),
    "u32_shr_xor_add": (it_shxor, U32),
    "u32_cmp_sel_add": (it_sel, U32),
    "f32_mul": (it_f32, jnp.float32),
    "u32_maskand": (it_maskand, U32),
    "u32_convert_add": (it_convert, U32),
    "u32_kernelmix": (it_kernelmix, U32),
}


def _make_kernel(it, K, C, dtype):
    def kernel(x_ref, y_ref, o_ref):
        xs = [x_ref[...] + dtype(c + 1) for c in range(C)]
        ys = [y_ref[...] + dtype(c + 1) for c in range(C)]
        for _ in range(K):
            for c in range(C):
                xs[c], ys[c], _ = it(xs[c], ys[c])
        acc = xs[0]
        for c in range(1, C):
            acc = (acc ^ xs[c]) if dtype == U32 else (acc + xs[c])
        o_ref[...] = acc
    return kernel


def _build(it, K, C, dtype, rows):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        _make_kernel(it, K, C, dtype),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )
    return jax.jit(lambda x, y: call(x, y))


def _time(f, x, y, reps):
    o = f(x, y)
    np.asarray(o[0, 0])  # warm + fence (tunnel-safe: fetch, don't block)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = f(x, y)  # data-chained reps: one final fetch fences all
    np.asarray(x[0, 0])
    return time.perf_counter() - t0


def measure(name, rows=512, C=8, reps=100, K1=256, K2=2048):
    it, dtype = MIXES[name]
    rng = np.random.RandomState(0)
    if dtype == U32:
        x = jnp.asarray(rng.randint(0, 2 ** 31, (rows, LANES)), U32)
        y = jnp.asarray(rng.randint(1, 2 ** 31, (rows, LANES)) | 1, U32)
    else:
        x = jnp.asarray(rng.rand(rows, LANES) * 0.1 + 1.0, dtype)
        y = jnp.asarray(rng.rand(rows, LANES) * 1e-4 + 1.0, dtype)
    _, _, nops = it(x[:1, :1], y[:1, :1])
    t1 = _time(_build(it, K1, C, dtype, rows), x, y, reps)
    t2 = _time(_build(it, K2, C, dtype, rows), x, y, reps)
    dops = (K2 - K1) * C * rows * LANES * nops * reps
    return dops / (t2 - t1)


def main():
    import datetime
    import os

    names = sys.argv[1:] or list(MIXES)
    out = {
        "platform": jax.devices()[0].platform,
        "device_kind": getattr(jax.devices()[0], "device_kind", ""),
        "date": datetime.date.today().isoformat(),
    }
    for name in names:
        if name == "u32_kernelmix":
            # 22 ops/iter: the standard K=2048 unrolls to a ~360k-op
            # straight-line program the Mosaic compiler chews on for
            # >50 min.  Differencing is K-invariant; use smaller chains
            # (K=256 -> 45k ops, same ballpark as the other mixes).
            rate = measure(name, K1=48, K2=256)
        else:
            rate = measure(name)
        out[name] = round(rate / 1e9, 1)  # G elem-ops/s
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    # merge into the dated artifact the roofline table reads
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "ubench.json")
    prior = {}
    if os.path.exists(path):
        with open(path) as fh:
            prior = json.load(fh)
    prior.update(out)
    with open(path, "w") as fh:
        json.dump(prior, fh, indent=1)


if __name__ == "__main__":
    main()
