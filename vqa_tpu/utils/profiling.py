"""Tracing / profiling subsystem — the TPU-native observability layer.

The reference has no profiling at all: progress is tqdm bars and
``time.time()`` epoch stamps (reference: training/train.py:166,339-354;
SURVEY.md §5 "Tracing / profiling: none"). On TPU, wall-clock timing
without fencing is meaningless — JAX dispatch is async, so a step
"returns" before the device has run it. This module provides the three
pieces the rebuild uses instead:

- :func:`annotate` / :func:`step_annotation` — named trace annotations
  that show up on the TensorBoard trace viewer timeline (XLA/TPU traces).
- :func:`start_trace` / :func:`stop_trace` / :class:`Profiler` — dump a
  TensorBoard-viewable device trace for a window of steps.
- :class:`StepTimer` — correctly fenced per-step wall timing
  (``block_until_ready`` on exit) with p50/p99 and items/sec summaries,
  the counters BASELINE.json cares about.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "annotate",
    "step_annotation",
    "start_trace",
    "stop_trace",
    "Profiler",
    "StepTimer",
    "percentile_summary",
    "time_chained",
    "device_synthetic_inputs",
]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7))
def _gen_synthetic(key, batch, image_size, qlen, vocab_size, num_answers,
                   channels, pixels):
    """Module-level jitted generator: one compile per distinct shape tuple,
    reused across calls and seeds (fresh per-call closures would recompile
    every invocation — and fresh compiles over the axon tunnel are the
    slow/hang-prone path the bench is trying to avoid)."""
    k1, k2, k3 = jax.random.split(key, 3)
    shape = (batch, image_size, image_size, channels)
    if pixels == "u8":
        imgs = jax.random.randint(k1, shape, 0, 256, jnp.int32).astype(
            jnp.uint8
        )
    else:
        imgs = jax.random.normal(k1, shape, jnp.float32)
    ids = jax.random.randint(k2, (batch, qlen), 4, vocab_size, jnp.int32)
    mask = jnp.ones((batch, qlen), jnp.int32)
    labels = jax.random.randint(k3, (batch,), 0, num_answers, jnp.int32)
    return imgs, ids, mask, labels


def device_synthetic_inputs(
    batch: int,
    *,
    image_size: int = 224,
    qlen: int = 20,
    vocab_size: int = 10000,
    num_answers: int = 1000,
    channels: int = 3,
    pixels: str = "f32",
    seed: int = 0,
):
    """Synthetic ``(images, token_ids, mask, labels)`` generated ON DEVICE.

    Benchmarks must never stage device-sized arrays on the host: a
    b=1024 image tensor is 616 MB (f32) and the axon TPU tunnel moves
    ~5-50 MB/s (measured 2026-08-18), so ``jnp.asarray(host_array)``
    stalls an experiment for minutes. One jitted program generates the
    whole batch device-side instead; timing validity is unchanged
    (same shapes/dtypes, random data).

    ``pixels``: ``"f32"`` — standard-normal float32 (post-normalize
    distribution); ``"u8"`` — uniform uint8 0..255 (pre-normalize raw
    pixels, for paths that include on-device normalize/augment).
    """
    return _gen_synthetic(
        jax.random.PRNGKey(seed), batch, image_size, qlen, vocab_size,
        num_answers, channels, pixels,
    )


def time_chained(fn, *args, reps: int = 3, chain: int = 10) -> float:
    """Best-of-``reps`` seconds per call over ``chain`` back-to-back
    dispatches, synchronized by one device→host scalar fetch.

    The microbenchmark-methodology primitive shared by the experiment
    scripts (``scripts/exp_*.py``). Over a tunneled TPU,
    ``jax.block_until_ready`` can return at enqueue time, so the only
    reliable fence is fetching a scalar program output with ``float()`` —
    outputs only materialize once the whole executable finishes. ``fn``
    must therefore return a scalar (or a tuple whose first element is
    one). Chaining ``chain`` dispatches before the single fetch amortizes
    tunnel RTT; best-of-``reps`` filters host noise (recorded numbers are
    best-case and documented as such).
    """
    best = float("inf")
    for _ in range(reps):
        r = None
        t0 = time.perf_counter()
        for _ in range(chain):
            r = fn(*args)
        _ = float(r[0] if isinstance(r, tuple) else r)
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def annotate(name: str):
    """Named trace annotation context manager.

    Inside an active profiler trace, the region shows up on the TensorBoard
    timeline under ``name``. Outside a trace it is a few-ns no-op, so it is
    safe to leave in production paths.
    """
    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover - profiler backend unavailable
        return contextlib.nullcontext()


def step_annotation(name: str, step: int):
    """Step-scoped trace annotation (groups work by training step in the
    trace viewer's step-time analysis)."""
    try:
        return jax.profiler.StepTraceAnnotation(name, step_num=step)
    except Exception:  # pragma: no cover
        return contextlib.nullcontext()


def start_trace(logdir: str) -> None:
    """Begin a device+host trace; view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


class Profiler:
    """Context manager tracing a window of work into ``logdir``.

    >>> with Profiler("/tmp/trace"):
    ...     out = train_step(...)
    ...     jax.block_until_ready(out)
    """

    def __init__(self, logdir: str):
        self.logdir = logdir

    def __enter__(self):
        start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        stop_trace()
        return False


def percentile_summary(values_ms: List[float]) -> Dict[str, float]:
    """mean/p50/p99 over a list of millisecond samples."""
    if not values_ms:
        return {"count": 0}
    arr = np.asarray(values_ms, dtype=np.float64)
    return {
        "count": int(arr.size),
        "mean_ms": float(arr.mean()),
        "p50_ms": float(np.percentile(arr, 50)),
        "p99_ms": float(np.percentile(arr, 99)),
        "min_ms": float(arr.min()),
        "max_ms": float(arr.max()),
    }


class StepTimer:
    """Fenced per-step timer: measures true device step time, not dispatch.

    Usage::

        timer = StepTimer()
        for batch in loader:
            with timer.step(items=len(batch)) as s:
                s.result = train_step(state, batch)   # fenced on exit

    On ``__exit__`` the timer calls ``jax.block_until_ready`` on whatever
    was assigned to ``s.result`` (skipped if nothing was assigned), so the
    recorded interval covers actual device execution. ``summary()`` returns
    mean/p50/p99 step time plus items/sec throughput.
    """

    class _Step:
        __slots__ = ("result",)

        def __init__(self):
            self.result: Any = None

    def __init__(self, max_samples: int = 100_000):
        # parallel (time_ms, items) samples so trimming keeps the
        # throughput numerator and denominator consistent
        self._samples: List[tuple] = []
        self._max = max_samples

    @contextlib.contextmanager
    def step(self, items: int = 1):
        s = StepTimer._Step()
        t0 = time.perf_counter()
        try:
            yield s
        finally:
            if s.result is not None:
                jax.block_until_ready(s.result)
            self._samples.append(
                ((time.perf_counter() - t0) * 1000.0, items)
            )
            if len(self._samples) > self._max:
                self._samples = self._samples[-self._max // 2:]

    def reset(self) -> None:
        self._samples = []

    def summary(self) -> Dict[str, float]:
        out = percentile_summary([t for t, _ in self._samples])
        total_s = sum(t for t, _ in self._samples) / 1000.0
        if total_s > 0:
            out["items_per_sec"] = float(
                sum(i for _, i in self._samples) / total_s
            )
        return out


@contextlib.contextmanager
def maybe_trace(logdir: Optional[str]):
    """Trace into ``logdir`` when set; otherwise a no-op. Lets CLI flags
    like ``--profile-dir`` gate tracing without branching at call sites."""
    if logdir:
        with Profiler(logdir):
            yield
    else:
        yield
