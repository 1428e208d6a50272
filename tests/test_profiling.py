"""Profiling/observability subsystem tests (vqa_tpu/utils/profiling.py).

The reference has no tracing at all (SURVEY.md §5); these cover the
TPU-native replacement: trace annotations, fenced step timing, and the
TensorBoard trace dump used by ``train.py --profile-dir``.
"""

import glob
import os

import jax
import jax.numpy as jnp

from vqa_tpu.utils.profiling import (
    Profiler,
    StepTimer,
    annotate,
    device_synthetic_inputs,
    maybe_trace,
    percentile_summary,
    step_annotation,
    time_chained,
)


def test_annotations_are_safe_noops_outside_trace():
    with annotate("region"):
        with step_annotation("step", 3):
            x = jnp.ones((4,)) * 2
    assert float(x.sum()) == 8.0


def test_step_timer_fences_and_summarizes():
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    timer = StepTimer()
    for _ in range(5):
        with timer.step(items=32) as s:
            s.result = f(x)
    out = timer.summary()
    assert out["count"] == 5
    assert out["p50_ms"] > 0
    assert out["p99_ms"] >= out["p50_ms"]
    assert out["items_per_sec"] > 0
    timer.reset()
    assert timer.summary() == {"count": 0}


def test_percentile_summary_empty():
    assert percentile_summary([]) == {"count": 0}


def test_profiler_writes_trace(tmp_path):
    logdir = str(tmp_path / "trace")
    with Profiler(logdir):
        jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((8,))))
    dumped = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert dumped, "profiler produced no trace files"


def test_maybe_trace_none_is_noop():
    with maybe_trace(None):
        pass


def test_device_synthetic_inputs_shapes_dtypes_and_ranges():
    # benchmark inputs are generated on device (host staging of a b=1024
    # image batch stalls the tunneled TPU transport); the contract the
    # exp_*/bench scripts rely on is shape/dtype/range fidelity
    imgs, ids, mask, labels = device_synthetic_inputs(
        3, image_size=32, qlen=6, vocab_size=50, num_answers=9
    )
    assert imgs.shape == (3, 32, 32, 3) and imgs.dtype == jnp.float32
    assert ids.shape == (3, 6) and ids.dtype == jnp.int32
    assert int(ids.min()) >= 4 and int(ids.max()) < 50  # no special tokens
    assert mask.shape == (3, 6) and int(mask.min()) == 1
    assert labels.shape == (3,) and 0 <= int(labels.min())
    assert int(labels.max()) < 9

    u8, _, _, _ = device_synthetic_inputs(2, image_size=16, pixels="u8")
    assert u8.dtype == jnp.uint8 and u8.shape == (2, 16, 16, 3)
    assert 0 <= int(u8.min()) and int(u8.max()) <= 255

    # distinct seeds must yield distinct buffers (bench rotates two)
    a, *_ = device_synthetic_inputs(2, image_size=16, seed=0)
    b, *_ = device_synthetic_inputs(2, image_size=16, seed=1)
    assert float(jnp.abs(a - b).max()) > 0


def test_time_chained_scalar_and_tuple_outputs():
    # the shared microbenchmark primitive (scripts/exp_*.py): must sync on
    # a scalar output, or on the first element of a tuple output
    f_scalar = jax.jit(lambda x: jnp.sum(x))
    f_tuple = jax.jit(lambda x: (jnp.sum(x), x * 2))
    x = jnp.ones((16, 16))
    _ = f_scalar(x), f_tuple(x)  # compile outside the timed region
    t1 = time_chained(f_scalar, x, reps=2, chain=3)
    t2 = time_chained(f_tuple, x, reps=2, chain=3)
    assert 0 < t1 < 10.0 and 0 < t2 < 10.0
