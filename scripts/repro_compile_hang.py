"""Minimal repro for the b=1024 fresh-compile hang on the axon
remote-compile transport (docs/PERF.md "Cold-compile-cache protection").

Builds the full-size VQA training-step program at a configurable batch
size and forces a FRESH compile by folding a unique constant into the
loss (different constant -> different HLO hash -> persistent-cache miss),
then reports how long the compile took — or hangs, which is the bug.

Observed on 2026-08-18 (v5e via axon tunnel): at --batch 1024 the compile
request is sent and both tunnel sockets go idle with zero host CPU,
indefinitely (reproduced 3x; --batch 256 compiles fine). Run under
`timeout` to bound it:

    timeout 900 python -u scripts/repro_compile_hang.py --batch 1024

Upstream note: the hang is in the PJRT remote-compile path of the axon
tunnel, not in XLA itself — the same program compiles on the CPU backend,
and cache-warmed b=1024 executables LOAD and run fine over the same
tunnel. bench.py works around it by warming compiles in killable probe
subprocesses (see bench.py warm_compile_cache).
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--cached", action="store_true",
                   help="skip cache-busting (measures warm-cache load time)")
    args = p.parse_args()

    from vqa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from vqa_tpu.models import create_vqa_model, init_vqa_model
    from vqa_tpu.training.train import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from vqa_tpu.utils.config import TrainingConfig
    from vqa_tpu.utils.profiling import device_synthetic_inputs

    backend = jax.default_backend()
    print(f"[repro] backend={backend} batch={args.batch}", flush=True)

    dtype = jnp.bfloat16 if backend != "cpu" else jnp.float32
    model = create_vqa_model(dtype=dtype)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    tx, _ = make_optimizer(TrainingConfig(), steps_per_epoch=100)
    base_step = make_train_step(model)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables["batch_stats"],
    )

    # cache-buster: a program-unique constant (nanosecond timestamp) folded
    # into the metrics changes the HLO hash without changing the math that
    # matters, guaranteeing a FRESH compile even with the persistent cache
    salt = 0.0 if args.cached else float(time.time_ns() % 100_000) * 1e-12

    @jax.jit
    def salted_step(state, imgs, ids, mask, labels, key):
        state, m = base_step(state, imgs, ids, mask, labels, key)
        m = dict(m)
        m["loss"] = m["loss"] + salt
        return state, m

    imgs, ids, mask, labels = device_synthetic_inputs(args.batch)
    print("[repro] inputs ready; compiling (fresh)" if salt else
          "[repro] inputs ready; compiling (cache-warm)", flush=True)
    t0 = time.perf_counter()
    state, m = salted_step(state, imgs, ids, mask, labels,
                           jax.random.PRNGKey(1))
    loss = float(m["loss"])
    dt = time.perf_counter() - t0
    print(f"[repro] OK: compile+first-step {dt:.1f}s, loss={loss:.4f} "
          f"(no hang at batch={args.batch})", flush=True)


if __name__ == "__main__":
    main()
    import os
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
