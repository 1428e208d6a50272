"""Host↔device input pipeline: threaded prefetch + sharded device_put.

The reference does synchronous in-process loading (num_workers=0,
reference: utils/config.py:163) with per-batch ``.to(device)`` copies
(training/train.py:170-173). On TPU that serializes the pipeline; here a
background thread prepares the next numpy batch while the device runs the
current step, and batches are placed with ``jax.device_put`` against the
mesh sharding so arrays land pre-sharded (batch split over the ``data``
axis — XLA never sees a host-side gather).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax
import numpy as np

_SENTINEL = object()


def _device_put_batch(batch: dict, sharding=None) -> dict:
    # Multi-process (one process per pod host): the loader on each host
    # yields only its local slice of the global batch; assemble the global
    # jax.Array from the per-process shards. Single-process: plain
    # device_put against the (possibly multi-device) sharding.
    multiprocess = sharding is not None and jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            if multiprocess:
                out[k] = jax.make_array_from_process_local_data(sharding, v)
            elif sharding is not None:
                out[k] = jax.device_put(v, sharding)
            else:
                out[k] = jax.device_put(v)
        else:
            out[k] = v
    return out


def prefetch_to_device(
    iterable: Iterable[dict],
    size: int = 2,
    sharding=None,
    transfer_in_consumer: bool = True,
) -> Iterator[dict]:
    """Double-buffered iterator: host prepares batch N+1 while the device
    computes on batch N.

    ``transfer_in_consumer=True`` (default): the producer thread only
    assembles numpy batches (decode/augment — the slow part) and the
    ``jax.device_put`` happens on the CONSUMER thread right before yield.
    All device interaction then stays on one thread — required on the
    tunneled axon TPU backend, where a producer-thread device_put racing
    the consumer's result fetches intermittently wedges the device stream
    mid-epoch (observed as a training hang after ~50-70 steps). The
    transfer itself is ~10 ms/batch, negligible next to the decode work
    that still overlaps.

    Args:
        iterable: yields dicts of numpy arrays (plus scalar metadata).
        size: prefetch depth (2 = classic double buffering).
        sharding: optional jax.sharding.Sharding for batch arrays.
        transfer_in_consumer: False restores producer-thread transfers
            (useful where a second thread's transfers are known-safe).
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    err: list = []

    def producer():
        try:
            for batch in iterable:
                if not transfer_in_consumer:
                    batch = _device_put_batch(batch, sharding)
                q.put(batch)
        except Exception as e:  # propagate into consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        if transfer_in_consumer:
            item = _device_put_batch(item, sharding)
        yield item


def batch_sharding(mesh, data_axis: str = "data"):
    """NamedSharding that splits the leading (batch) dim over the data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(data_axis))
