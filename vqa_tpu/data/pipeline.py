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
) -> Iterator[dict]:
    """Double-buffered iterator: host prepares + transfers batch N+1 while
    the device computes on batch N.

    Args:
        iterable: yields dicts of numpy arrays (plus scalar metadata).
        size: prefetch depth (2 = classic double buffering).
        sharding: optional jax.sharding.Sharding for batch arrays.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    err: list = []

    def producer():
        try:
            for batch in iterable:
                q.put(_device_put_batch(batch, sharding))
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
        yield item


def batch_sharding(mesh, data_axis: str = "data"):
    """NamedSharding that splits the leading (batch) dim over the data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(data_axis))
