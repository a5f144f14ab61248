"""Streaming executor: overlap host marshalling with device execution.

Production serving path: a background thread quantizes batch k+1 (using the
native C++ marshaller) and transfers it while the device inverts batch k,
so sustained throughput approaches the device-compute bound instead of
host+device serialized time.  The reference has no analog (it runs one
inversion per process invocation); this is the TPU-native "data loader"
component.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class _ProducerFailure:
    """Sentinel carrying a producer-thread exception to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class StreamingInverter:
    """Pipelined batched inversion over an iterator of matrix batches.

    Usage:
        inv = BatchedMatrixInversion(params, B, backend="packed", io="packed")
        stream = StreamingInverter(inv, depth=2)
        for result in stream.run(batches):   # batches: iterable of (B, n, n)
            ...
    """

    def __init__(self, batched_inverter, depth: int = 2):
        self.inv = batched_inverter
        self.depth = max(1, depth)

    def _producer(self, batches, q):
        import jax
        import jax.numpy as jnp

        try:
            for M in batches:
                a, b = self.inv.quantize(np.asarray(M, dtype=np.float64))
                device_args = (
                    jax.device_put(jnp.asarray(a, jnp.int64)),
                    jax.device_put(jnp.asarray(b, jnp.int64)),
                )
                q.put(device_args)
            q.put(None)  # clean end-of-stream
        except BaseException as exc:  # propagate to the consumer, never truncate
            q.put(_ProducerFailure(exc))

    def run(self, batches):
        """Yield dequantized (B, n, n) inverse batches, pipelined.

        A failure while quantizing/transferring any batch re-raises in the
        consumer (after draining results already in flight) instead of
        silently truncating the stream.
        """
        q = queue.Queue(maxsize=self.depth)
        producer = threading.Thread(
            target=self._producer, args=(batches, q), daemon=True
        )
        producer.start()

        in_flight = []
        failure = None
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, _ProducerFailure):
                failure = item
                break
            out = self.inv.run_raw(*item)  # async dispatch
            in_flight.append(out)
            while len(in_flight) >= self.depth:
                yield self._finish(in_flight.pop(0))
        for out in in_flight:
            yield self._finish(out)
        producer.join()
        if failure is not None:
            raise RuntimeError(
                "StreamingInverter producer failed while preparing a batch"
            ) from failure.exc

    def _finish(self, out):
        import jax

        jax.block_until_ready(out)
        if isinstance(out, tuple):
            host = tuple(np.asarray(o) for o in out)
        else:
            host = np.asarray(out)
        return self.inv.dequantize(host)
