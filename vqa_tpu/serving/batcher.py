"""Cross-request micro-batching queue.

The reference serves one forward per HTTP request with no batching across
concurrent requests (SURVEY.md §3.3 — the key serving gap). This batcher
collects concurrent requests for up to ``batch_timeout_ms`` (or until
``max_batch_size``), runs ONE bucket-padded jitted forward for the whole
group, and fans results back out — the p50/p99 win on BASELINE config #5.

Thread-based (works under any HTTP server, stdlib or ASGI): callers block
on a per-request event; a single worker thread drains the queue.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, List, Optional

import numpy as np


@dataclass
class _Request:
    image: Any
    question: str
    top_k: int
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[dict] = None
    error: Optional[Exception] = None


class MicroBatcher:
    """Collect → batch → one forward → fan out."""

    def __init__(
        self,
        engine,
        max_batch_size: int = 32,
        batch_timeout_ms: float = 5.0,
    ):
        self.engine = engine
        self.max_batch_size = max_batch_size
        self.timeout_s = batch_timeout_ms / 1000.0
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        # observability: serving latency counters
        self.total_requests = 0
        self.total_batches = 0
        self._latencies_ms: List[float] = []
        self._lat_lock = threading.Lock()

    # ------------------------------------------------------------------
    def submit(self, image, question: str, top_k: int = 5, timeout: float = 30.0) -> dict:
        """Blocking submit — returns the prediction dict."""
        t0 = time.perf_counter()
        req = _Request(image=image, question=question, top_k=top_k)
        self._q.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("prediction timed out")
        if req.error is not None:
            raise req.error
        with self._lat_lock:
            self.total_requests += 1
            self._latencies_ms.append((time.perf_counter() - t0) * 1000)
            if len(self._latencies_ms) > 10000:
                self._latencies_ms = self._latencies_ms[-5000:]
        return req.result

    def latency_stats(self) -> dict:
        with self._lat_lock:
            lat = list(self._latencies_ms)
        if not lat:
            return {"count": 0}
        arr = np.asarray(lat)
        return {
            "count": int(arr.size),
            "p50_ms": float(np.percentile(arr, 50)),
            "p99_ms": float(np.percentile(arr, 99)),
            "mean_ms": float(arr.mean()),
            "batches": self.total_batches,
        }

    def shutdown(self) -> None:
        self._stop.set()
        self._worker.join(timeout=2.0)

    # ------------------------------------------------------------------
    def _collect(self) -> List[_Request]:
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        group = [first]
        deadline = time.perf_counter() + self.timeout_s
        while len(group) < self.max_batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                group.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return group

    def _run(self) -> None:
        while not self._stop.is_set():
            group = self._collect()
            if not group:
                continue
            # Fast path: decode/resize the whole group in ONE batched call
            # (keeps the native thread-pool resize parallelism on the hot
            # path). Only if the batch fails do we fall back to per-request
            # isolation, so one corrupt upload still fails only its own
            # request, not every concurrent caller batched with it (the
            # reference is one-forward-per-request and isolates for free).
            good: List[_Request] = []
            pixels: List[Any] = []
            try:
                batch_pixels = self.engine._preprocess_images(
                    [r.image for r in group]
                )
                good = list(group)
                pixels = list(batch_pixels)
            except Exception:
                for r in group:
                    try:
                        pixels.append(
                            self.engine._preprocess_images([r.image])[0]
                        )
                        good.append(r)
                    except Exception as e:
                        r.error = e
            try:
                if good:
                    probs = self.engine.predict_probs_from_pixels(
                        np.stack(pixels),
                        [r.question for r in good],
                    )
                    for r, p in zip(good, probs):
                        r.result = self.engine._format_result(
                            r.question, p, r.top_k
                        )
            except Exception as e:  # model/device failure affects the batch
                for r in good:
                    r.error = e
            finally:
                self.total_batches += 1
                for r in group:
                    r.event.set()
