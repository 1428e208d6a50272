"""Minimal repro for the per-execution host-RSS growth seen on the axon
TPU backend (round-4 10k soak: monotonic +0.25 MB/request full-size;
round-5 bisect: tiny model +0.095 MB/request on TPU, same serving stack
flat on CPU — so the serving layer is exonerated and the leak sits in the
TPU execution path).

Runs a bare jitted forward in a loop — fresh host inputs each call, result
pulled back to host, no HTTP/batcher/engine — and samples RSS. If RSS grows
here, the leak is in the PJRT client (per-execution buffers / transfer
bookkeeping), not in anything this framework allocates.

Discriminators:
  --gc-every N    run gc.collect() every N iters — if RSS stops growing, the
                  growth is cyclic Python garbage
  --trim-every N  run glibc malloc_trim(0) every N iters — if RSS stops
                  growing, the "leak" is freed-but-retained heap (glibc
                  arena retention/fragmentation), not live memory
  --tracemalloc   snapshot Python-level allocations per window — flat Python
                  while RSS grows means the growth is native (PJRT/C++)

Usage: python scripts/repro_tpu_rss_leak.py [--iters 3000] [--gc-every N]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys

sys.path.insert(0, ".")

import numpy as np

from vqa_tpu.serving.supervisor import rss_mb as _rss_mb_of
from vqa_tpu.utils.cache import enable_compilation_cache


def rss_mb() -> float:
    return _rss_mb_of(os.getpid())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--gc-every", type=int, default=0,
                   help="run gc.collect() every N iters (0 = never)")
    p.add_argument("--trim-every", type=int, default=0,
                   help="run glibc malloc_trim(0) every N iters (0 = never)")
    p.add_argument("--tracemalloc", action="store_true",
                   help="record Python-level allocation totals per window")
    p.add_argument("--windows", type=int, default=10)
    from vqa_tpu.utils.platform import add_platform_args, apply_platform_args

    add_platform_args(p)
    args = p.parse_args()
    apply_platform_args(args)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from vqa_tpu.models import create_vqa_model, init_vqa_model, predict_topk
    from vqa_tpu.utils.config import tiny_model_config

    cfg = tiny_model_config()
    model = create_vqa_model(config=cfg)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    size = cfg.image_size
    length = cfg.max_question_length
    backend = jax.devices()[0].platform

    rng = np.random.default_rng(0)

    def one(i: int):
        img = rng.standard_normal((1, size, size, 3), dtype=np.float32)
        ids = rng.integers(0, cfg.vocab_size, (1, length), dtype=np.int32)
        mask = np.ones((1, length), np.int32)
        idx, probs = predict_topk(model, variables, jnp.asarray(img),
                                  jnp.asarray(ids), jnp.asarray(mask),
                                  top_k=3)
        return np.asarray(idx), np.asarray(probs)

    trim = None
    if args.trim_every:
        import ctypes
        libc = ctypes.CDLL("libc.so.6")
        trim = lambda: libc.malloc_trim(0)

    tm = None
    if args.tracemalloc:
        import tracemalloc
        tracemalloc.start()
        tm = tracemalloc

    one(0)  # compile
    gc.collect()
    r0 = rss_mb()
    samples = [(0, r0)]
    py_mb = []
    per = max(args.iters // args.windows, 1)
    for i in range(args.iters):
        one(i)
        if args.gc_every and (i + 1) % args.gc_every == 0:
            gc.collect()
        if args.trim_every and (i + 1) % args.trim_every == 0:
            trim()
        if (i + 1) % per == 0:
            samples.append((i + 1, rss_mb()))
            if tm is not None:
                py_mb.append(round(tm.get_traced_memory()[0] / 2**20, 2))
    gc.collect()
    if trim is not None:
        trim()
    r1 = rss_mb()
    growth = r1 - r0
    last_third = [r for i, r in samples if i >= args.iters * 2 / 3]
    lt = (last_third[-1] / last_third[0] - 1.0) * 100 if len(last_third) > 1 else 0.0
    import json
    print(json.dumps({
        "backend": backend,
        "iters": args.iters,
        "gc_every": args.gc_every,
        "trim_every": args.trim_every,
        "py_traced_mb_per_window": py_mb or None,
        "rss_start_mb": round(r0, 1),
        "rss_end_mb": round(r1, 1),
        "growth_mb": round(growth, 1),
        "kb_per_exec": round(growth * 1024 / args.iters, 1),
        "rss_samples": [(i, round(r, 1)) for i, r in samples],
        "last_third_growth_pct": round(lt, 2),
    }))


if __name__ == "__main__":
    main()
