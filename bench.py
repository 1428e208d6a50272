"""Benchmark: batched VQA inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "pairs_per_sec_per_chip", "value": N, "unit": "pairs/s",
   "vs_baseline": N / 14.8, ...extras}

Baseline: the PyTorch reference measured on this container's CPU at
14.8 pairs/s (b=32, its best configuration — SURVEY.md §6). BASELINE.json
north star: ≥10× that, with <1e-3 logit fidelity (tests/test_parity.py).

The benched program is the production inference path: uint8 pixels →
on-device normalize → full VQA forward (bf16 compute on TPU) → logits,
one XLA program. (Inputs are NOT donated: the bench rotates two persistent
input buffers, which donation would invalidate.)
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import signal
import subprocess
import sys
import threading
import time

import numpy as np

# ---------------------------------------------------------------------------
# Emission robustness (VERDICT r4 #1): the driver runs this script under a
# hard timeout and parses the LAST JSON line on stdout. Round 4 produced no
# line at all because everything (probes included) was serialized before a
# single print. Now:
#   * the result line is (re-)emitted after EVERY batch completes — the last
#     printed line wins, so a mid-run kill still yields the best-so-far;
#   * SIGTERM/SIGINT/SIGALRM flush the best-so-far line before dying;
#   * an overall wall-clock budget (BENCH_BUDGET_S, default 1500 s) bounds
#     the run — remaining phases are skipped, the final line is marked
#     "budget_exhausted", and a SIGALRM backstop fires 45 s past it.
# ---------------------------------------------------------------------------

_LAST_LINE: dict | None = None
_FINAL_PRINTED = False
_DEADLINE: float | None = None


def emit(line: dict, final: bool = False) -> None:
    """Print the JSON result line (progressively refreshed; last one wins)."""
    global _LAST_LINE, _FINAL_PRINTED
    _LAST_LINE = dict(line)
    if final:
        _FINAL_PRINTED = True
    print(json.dumps(line), flush=True)


def _flush_and_exit(signum, frame):
    # Signal context: the signal may land while the main thread is inside
    # emit()'s print holding the stdout BufferedWriter lock, where a
    # reentrant print()/flush() raises RuntimeError and the handler would
    # die before reaching os._exit — losing the very line this guard
    # exists to save. Write the raw fd instead; the leading newline closes
    # any half-written line so the flushed JSON stays parseable on its own.
    if not _FINAL_PRINTED:
        line = dict(_LAST_LINE) if _LAST_LINE else {
            "metric": "pairs_per_sec_per_chip", "value": 0.0,
            "unit": "pairs/s", "vs_baseline": 0.0,
            "error": "killed before any batch completed",
        }
        line["partial"] = True
        try:
            line["killed_by"] = signal.Signals(signum).name
        except ValueError:
            line["killed_by"] = int(signum)
        try:
            os.write(1, ("\n" + json.dumps(line) + "\n").encode())
        except OSError:
            pass
    os._exit(0)


def install_guards() -> None:
    """Signal handlers + wall-clock budget. Call before any backend work."""
    global _DEADLINE
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    _DEADLINE = time.monotonic() + budget
    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
        signal.signal(sig, _flush_and_exit)
    # hard backstop: even a hang inside a C extension that ignores the
    # budget checks gets pre-empted before the driver's own kill
    signal.alarm(int(budget) + 45)


def time_left() -> float:
    return float("inf") if _DEADLINE is None else _DEADLINE - time.monotonic()

# Dense per-chip peak FLOP/s (bf16 systolic) by TPU generation — used to
# turn measured throughput + compiler-reported FLOPs into MFU.
_TPU_PEAK_BF16 = {
    "v6e": 918e12,
    "v5p": 459e12,
    "v5e": 197e12,
    "v4": 275e12,
    "v3": 123e12,
}


def _chip_peak_flops(dtype_name: str):
    """(peak_flops, generation) for the attached chip, or (None, kind).

    Real device_kind strings do not contain the short generation names
    ("TPU v5 lite" for v5e, "TPU v6 lite" for v6e, "TPU v5p", "TPU v4"),
    so match explicit patterns, most specific first."""
    import jax

    kind = str(getattr(jax.devices()[0], "device_kind", "") or "")
    gen_env = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    s = (kind + " " + gen_env).lower()
    patterns = [
        ("v6 lite", "v6e"), ("v6e", "v6e"),
        ("v5 lite", "v5e"), ("v5litepod", "v5e"), ("v5e", "v5e"),
        ("v5p", "v5p"),
        ("v4", "v4"), ("v3", "v3"),
    ]
    for pat, gen in patterns:
        if pat in s:
            peak = _TPU_PEAK_BF16[gen]
            if dtype_name == "float32":
                peak /= 2  # f32 runs through the MXU at half rate
            return peak, gen
    return None, s.strip()


def _mfu_fields(flops, batch, pairs_per_sec, dtype_name,
                backend: str = "tpu") -> dict:
    """flops_per_pair / model_tflops_per_sec / mfu / chip JSON fields from
    compiler-reported program FLOPs and measured throughput. MFU is only
    meaningful against a TPU peak — omitted on the CPU backend (where the
    PALLAS_AXON_TPU_GEN env var would otherwise still match a chip)."""
    if not flops:
        return {}
    per_pair = flops / batch
    out = {
        "flops_per_pair": round(per_pair),
        "model_tflops_per_sec": round(per_pair * pairs_per_sec / 1e12, 2),
    }
    if backend == "cpu":
        return out
    peak, gen = _chip_peak_flops(dtype_name)
    if peak:
        out["mfu"] = round(per_pair * pairs_per_sec / peak, 4)
        out["chip"] = gen
    return out


def _compiled_flops(jitted, *example_args):
    """Compiler-reported FLOPs per execution of the jitted program
    (XLA cost_analysis), or None when the backend doesn't report it."""
    try:
        ca = jitted.lower(*example_args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


# ---------------------------------------------------------------------------
# Cold-compile-cache protection (VERDICT r3 weak #3)
# ---------------------------------------------------------------------------
# Fresh b=1024 compiles are known to hang the axon remote-compile transport
# indefinitely (docs/PERF.md: request sent, both tunnel sockets idle,
# reproduced 3x). A hang inside THIS process would kill the driver's bench
# run, so compiles are warmed first in a KILLABLE subprocess ("probe"): it
# compiles each batch's program ascending (progressive warm — each size
# reuses fused subgraphs of the previous) and writes the result into the
# persistent XLA compile cache; the main process then loads executables
# from the cache instead of compiling. A probe that exceeds the per-batch
# watchdog is killed and retried once; a batch that fails twice is dropped
# along with every LARGER batch (the hang correlates with program size)
# and reported in the JSON line as "skipped_batches" — the headline value
# falls back to the best batch that completed.


def _probe_flags(args, train: bool):
    flags = []
    if args.f32:
        flags.append("--f32")
    if args.s2d:
        flags.append("--s2d")
    if args.fused_stem:
        flags.append("--fused-stem")
    if args.pallas:
        flags.append("--pallas")
    if train:
        flags += ["--train", "--grad-accum", str(args.grad_accum),
                  "--remat", args.remat]
        if args.aug:
            flags.append("--aug")
    return flags


def probe_main(args):
    """Subprocess body (--probe): compile + run each batch's program once,
    printing 'PROBE_OK <b>' after each so the parent can watchdog
    per-batch progress. Shares main()'s persistent compile cache."""
    import jax

    if args.train:
        # reuse the full train-bench setup for one warmup step per batch
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
        print(f"PROBE_BACKEND {backend}", flush=True)
        dtype = jnp.bfloat16 if (backend != "cpu" and not args.f32) else jnp.float32
        model = create_vqa_model(
            dtype=dtype, stem_s2d=args.s2d, stem_fused=args.fused_stem,
            use_pallas_cross_attention=args.pallas,
        )
        variables = init_vqa_model(model, jax.random.PRNGKey(0))
        tx, _ = make_optimizer(TrainingConfig(), steps_per_epoch=100)
        train_step = make_train_step(
            model, grad_accum=args.grad_accum, remat=args.remat)
        for b in args.batches:
            state = TrainState.create(
                apply_fn=model.apply,
                params=jax.tree.map(jnp.copy, variables["params"]),
                tx=tx,
                batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            )
            imgs, ids, mask, labels = device_synthetic_inputs(b)
            state, m = train_step(state, imgs, ids, mask, labels,
                                  jax.random.PRNGKey(1))
            _ = float(m["loss"])
            print(f"PROBE_OK {b}", flush=True)
        return

    import jax.numpy as jnp

    from vqa_tpu.data.preprocess import device_normalize
    from vqa_tpu.models import create_vqa_model, init_vqa_model
    from vqa_tpu.utils.profiling import device_synthetic_inputs

    backend = jax.default_backend()
    print(f"PROBE_BACKEND {backend}", flush=True)
    dtype = jnp.bfloat16 if (backend != "cpu" and not args.f32) else jnp.float32
    model = create_vqa_model(
        dtype=dtype, stem_s2d=args.s2d, stem_fused=args.fused_stem,
        use_pallas_cross_attention=args.pallas,
    )
    variables = init_vqa_model(model, jax.random.PRNGKey(0))

    @jax.jit
    def infer(variables, pixels_u8, token_ids, attention_mask):
        images = device_normalize(pixels_u8).astype(dtype)
        logits, _ = model.apply(
            variables, images, token_ids, attention_mask, train=False
        )
        return logits

    for b in args.batches:
        px, ids, mask, _ = device_synthetic_inputs(b, pixels="u8", seed=0)
        out = infer(variables, px, ids, mask)
        _ = float(out[0, 0])
        print(f"PROBE_OK {b}", flush=True)


def warm_compile_cache(batches, args, train: bool = False):
    """Warm the persistent compile cache for ``batches`` (ascending) via
    killable probe subprocesses. Returns (ok_batches, skipped_batches).

    Skipped when the caller forced the CPU backend (local compiles can't
    hang the transport) or BENCH_NO_PROBE=1.
    """
    if os.environ.get("BENCH_NO_PROBE") == "1" or (
        os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    ):
        return list(batches), []
    timeout_s = float(os.environ.get("BENCH_PROBE_TIMEOUT", "900"))
    # backend/tunnel init allowance before the first batch's own budget
    init_grace_s = float(os.environ.get("BENCH_PROBE_INIT_GRACE", "120"))
    remaining = sorted(batches)
    ok, retried = [], set()
    while remaining:
        # never start a probe the wall-clock budget can't accommodate —
        # report the un-warmed batches as skipped instead of overrunning
        allowed = min(timeout_s + init_grace_s, max(time_left() - 20.0, 0.0))
        if allowed < 30.0:
            print(f"[bench] budget exhausted before probing {remaining}",
                  file=sys.stderr)
            return ok, list(remaining)
        cmd = [sys.executable, os.path.abspath(__file__), "--probe",
               "--batches", *map(str, remaining), *_probe_flags(args, train)]
        proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        lines: "queue.Queue[str]" = queue.Queue()
        t = threading.Thread(
            target=lambda: [lines.put(l) for l in proc.stdout],
            daemon=True,
        )
        t.start()
        deadline = time.time() + allowed
        failed = None
        budget_cut = False
        while remaining:
            try:
                line = lines.get(timeout=2.0)
            except queue.Empty:
                if proc.poll() is not None and lines.empty():
                    # probe died (rc != 0) before finishing — like a hang
                    failed = remaining[0]
                    break
                if time.time() > deadline or time_left() < 20.0:
                    proc.kill()
                    failed = remaining[0]
                    budget_cut = time_left() < 20.0
                    break
                continue
            if line.startswith("PROBE_OK"):
                b = int(line.split()[1])
                if b in remaining:
                    remaining.remove(b)
                    ok.append(b)
                deadline = time.time() + min(timeout_s,
                                             max(time_left() - 20.0, 1.0))
            elif line.startswith("PROBE_BACKEND"):
                # init done
                deadline = time.time() + min(timeout_s,
                                             max(time_left() - 20.0, 1.0))
        if failed is None:
            proc.wait()
            break
        if budget_cut:
            print(f"[bench] budget exhausted while probing; skipping "
                  f"{remaining}", file=sys.stderr)
            return ok, list(remaining)
        if failed in retried:
            print(f"[bench] batch {failed} failed twice; dropping it and "
                  f"all larger batches: {remaining}", file=sys.stderr)
            skipped = list(remaining)
            return ok, skipped
        print(f"[bench] probe for batch {failed} timed out/died; "
              f"retrying once", file=sys.stderr)
        retried.add(failed)
    return ok, []


def bench_train(args, print_line: bool = True, warm: bool = True):
    """Training-throughput mode (BASELINE config #4): full-size model,
    one jitted fwd+CE+bwd+update+BN-EMA program, synthetic data.

    Baseline: the reference README claims 30 epochs x 20k pairs in ~2-4h on
    an >=8GB GPU (reference: README.md:69,216,250) -> ~55.6 pairs/s at the
    3h midpoint. The reference publishes nothing more precise (SURVEY.md §6).

    ``print_line=False`` returns the JSON line dict instead of printing
    (used for the compact "train" sub-object in the default inference line);
    ``warm=False`` skips the probe pass when the caller already warmed the
    compile cache.
    """
    batch_list = args.batches or ([64] if args.quick else [64, 128, 256])
    skipped = []
    if warm:
        batch_list, skipped = warm_compile_cache(batch_list, args, train=True)
        if not batch_list:
            line = {"metric": "train_pairs_per_sec_per_chip", "value": 0.0,
                    "unit": "pairs/s", "error": "all train compiles failed",
                    "skipped_batches": skipped}
            if print_line:
                emit(line, final=True)
            return line

    import jax
    import jax.numpy as jnp

    from vqa_tpu.models import create_vqa_model, init_vqa_model
    from vqa_tpu.training.train import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from vqa_tpu.utils.config import TrainingConfig

    backend = jax.default_backend()
    dtype = jnp.bfloat16 if (backend != "cpu" and not args.f32) else jnp.float32
    model = create_vqa_model(
        dtype=dtype,
        stem_s2d=args.s2d,
        stem_fused=args.fused_stem,
        use_pallas_cross_attention=args.pallas,
    )
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    tx, _ = make_optimizer(TrainingConfig(), steps_per_epoch=100)
    train_step = make_train_step(
        model, grad_accum=args.grad_accum, remat=args.remat)

    if args.aug:
        import functools

        from vqa_tpu.data.preprocess import device_augment

        augment = jax.jit(functools.partial(device_augment, image_size=224))

    from vqa_tpu.utils.profiling import device_synthetic_inputs

    baseline = 55.6  # pairs/s, reference README 20k x 30 epochs / 3h midpoint
    dtype_name = str(dtype.__name__ if hasattr(dtype, "__name__") else dtype)

    def assemble(best, best_batch, results, flops_by_batch, extra=None):
        line = {
            "metric": "train_pairs_per_sec_per_chip",
            **({"grad_accum": args.grad_accum} if args.grad_accum > 1 else {}),
            **({"remat": args.remat} if args.remat != "none" else {}),
            "value": round(best, 2),
            "unit": "pairs/s",
            "vs_baseline": round(best / baseline, 2),
            "best_batch": best_batch,
            "backend": backend,
            "dtype": dtype_name,
            "throughput_by_batch": dict(results),
        }
        if skipped:
            line["skipped_batches"] = skipped
        line.update(_mfu_fields(flops_by_batch.get(best_batch), best_batch,
                                best, dtype_name, backend))
        if extra:
            line.update(extra)
        return line

    results = {}
    flops_by_batch = {}
    best, best_batch = 0.0, 0
    chain = 3 if args.quick else 10
    reps = 2 if args.quick else 3
    budget_cut = False
    for b in batch_list:
        if time_left() < 45.0:
            budget_cut = True
            print(f"[bench] budget exhausted before train batch {b}",
                  file=sys.stderr)
            break
        # train_step donates its state, so give each batch size fresh
        # copies — the originals are deleted after the first step
        state = TrainState.create(
            apply_fn=model.apply,
            params=jax.tree.map(jnp.copy, variables["params"]),
            tx=tx,
            batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
        )
        # Inputs generated on device: host staging of a 154-616 MB batch
        # through the axon tunnel (~5-50 MB/s measured) stalls the bench.
        if args.aug:  # uint8 crop sources; augmentation runs on device
            imgs, ids, mask, labels = device_synthetic_inputs(
                b, image_size=256, pixels="u8")
        else:
            imgs, ids, mask, labels = device_synthetic_inputs(b)
        key = jax.random.PRNGKey(0)

        def one_step(state, i):
            images = augment(imgs, jax.random.fold_in(key, i)) if args.aug else imgs
            return train_step(state, images, ids, mask, labels, key)

        for i in range(2):  # warmup/compile
            state, m = one_step(state, i)
        jax.block_until_ready(m)
        if not args.aug:  # cost the train-step program (lower only; no exec)
            f = _compiled_flops(
                train_step, state, imgs, ids, mask, labels, key
            )
            # XLA cost_analysis counts a lax.scan body ONCE, not x trip
            # count (measured: the accum-4 program reports exactly 1/4 the
            # accum-1 FLOPs) — scale back to real executed FLOPs.
            flops_by_batch[b] = f * args.grad_accum if f else f
        for _ in range(reps):
            t0 = time.perf_counter()
            for i in range(chain):
                state, m = one_step(state, i)
            jax.block_until_ready(m)
            _ = float(m["loss"])  # force completion through the tunnel
            dt = time.perf_counter() - t0
            best_rep = b * chain / dt
            results[f"b{b}"] = round(max(results.get(f"b{b}", 0), best_rep), 2)
        if results[f"b{b}"] > best:
            best, best_batch = results[f"b{b}"], b
        if print_line:  # progressive: last printed line wins
            emit(assemble(best, best_batch, results, flops_by_batch,
                          {"partial": True}))

    extra = {"budget_exhausted": True} if budget_cut else None
    line = assemble(best, best_batch, results, flops_by_batch, extra)
    if print_line:
        emit(line, final=True)
    return line


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="fewer timed iters")
    p.add_argument("--train", action="store_true",
                   help="benchmark the training step instead of inference")
    p.add_argument("--aug", action="store_true",
                   help="with --train: include on-device augmentation "
                        "(uint8 256px sources, crop/flip/jitter in XLA)")
    p.add_argument("--batches", type=int, nargs="+", default=None)
    p.add_argument("--grad-accum", type=int, default=1,
                   help="with --train: microbatches per optimizer step")
    p.add_argument("--remat", choices=["none", "full", "stages"],
                   default="none",
                   help="with --train: jax.checkpoint policy for the "
                        "backward (matches the train CLI's --remat)")
    p.add_argument("--f32", action="store_true", help="disable bf16 compute")
    p.add_argument("--fused-stem", action="store_true",
                   help="fused Pallas stem execution plan (inference only)")
    p.add_argument("--s2d", action="store_true",
                   help="space-to-depth stem execution plan (measured ~4%% "
                        "slower than XLA's native stem handling on this chip)")
    p.add_argument("--pallas", action="store_true",
                   help="use the fused Pallas cross-attention kernel")
    p.add_argument("--probe", action="store_true",
                   help="internal: compile-cache warmer subprocess mode")
    p.add_argument("--no-train", action="store_true",
                   help="omit the compact train sub-object from the "
                        "default JSON line")
    args = p.parse_args()

    from vqa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.probe:
        return probe_main(args)

    install_guards()

    if args.train:
        return bench_train(args)

    # --- cold-cache protection: warm every program in killable probe
    # subprocesses BEFORE this process touches the backend (two processes
    # must not share the axon tunnel concurrently) ---
    batch_sizes = args.batches or (
        [32, 128] if args.quick else [1, 8, 32, 128, 256, 512, 1024]
    )
    batch_sizes, skipped = warm_compile_cache(batch_sizes, args)
    train_b = None
    if not args.no_train:
        # compact train measurement (VERDICT r3 weak #6): b=256 on TPU —
        # the batch docs/PERF.md's training numbers use; tiny on CPU where
        # a full-size b=256 train compile would dominate the run
        on_cpu_env = os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
        train_b = 8 if (on_cpu_env or args.quick) else 256
        ok_t, _ = warm_compile_cache([train_b], args, train=True)
        if not ok_t:
            train_b = None  # train compile hangs → keep the inference line

    if not batch_sizes:
        emit({
            "metric": "pairs_per_sec_per_chip", "value": 0.0,
            "unit": "pairs/s", "error": "all inference compiles failed",
            "skipped_batches": skipped,
        }, final=True)
        return

    import jax
    import jax.numpy as jnp

    from vqa_tpu.data.preprocess import device_normalize
    from vqa_tpu.models import create_vqa_model, init_vqa_model

    backend = jax.default_backend()
    on_tpu = backend != "cpu"
    dtype = jnp.bfloat16 if (on_tpu and not args.f32) else jnp.float32

    model = create_vqa_model(  # full-size flagship
        dtype=dtype,
        stem_s2d=args.s2d,
        stem_fused=args.fused_stem,
        use_pallas_cross_attention=args.pallas,
    )
    variables = init_vqa_model(model, jax.random.PRNGKey(0))

    @jax.jit
    def infer(variables, pixels_u8, token_ids, attention_mask):
        images = device_normalize(pixels_u8).astype(dtype)
        logits, _ = model.apply(
            variables, images, token_ids, attention_mask, train=False
        )
        return logits

    from vqa_tpu.utils.profiling import device_synthetic_inputs

    warmup = 2 if args.quick else 3
    chain = 5 if args.quick else 20  # pipelined dispatches between fetches
    reps = 2 if args.quick else 3

    baseline = 14.8  # CPU torch reference, b=32 (SURVEY.md §6)
    dtype_name = str(dtype.__name__ if hasattr(dtype, "__name__") else dtype)

    def assemble(best_throughput, best_batch, results, latency,
                 flops_by_batch, extra=None):
        line = {
            "metric": "pairs_per_sec_per_chip",
            "value": round(best_throughput, 2),
            "unit": "pairs/s",
            "vs_baseline": round(best_throughput / baseline, 2),
            "best_batch": best_batch,
            "backend": backend,
            "dtype": dtype_name,
            "throughput_by_batch": dict(results),
        }
        if latency.get("b1") is not None:
            line["p50_latency_b1_ms"] = round(latency["b1"], 3)
        if skipped:
            line["skipped_batches"] = skipped
        # MFU: compiler-reported FLOPs/pair × measured pairs/s ÷ chip peak
        line.update(_mfu_fields(flops_by_batch.get(best_batch), best_batch,
                                best_throughput, dtype_name, backend))
        if extra:
            line.update(extra)
        return line

    results = {}
    latency = {}
    flops_by_batch = {}
    best_throughput, best_batch = 0.0, 0
    budget_cut = False
    for b in batch_sizes:
        if time_left() < 45.0:
            budget_cut = True
            print(f"[bench] budget exhausted before batch {b}",
                  file=sys.stderr)
            break
        # rotate distinct input buffers so no layer of the stack can reuse
        # a previous execution's result; generated on device (host staging
        # of 154 MB batches stalls the axon tunnel)
        inputs = []
        for seed in range(2):
            px, ids, mask, _ = device_synthetic_inputs(
                b, pixels="u8", seed=seed)
            inputs.append((px, ids, mask))
        for i in range(warmup):
            px, ids, mask = inputs[i % 2]
            jax.block_until_ready(infer(variables, px, ids, mask))
        flops_by_batch[b] = _compiled_flops(infer, variables, *inputs[0])

        # sustained throughput: chain dispatches, fetch once at the end —
        # measures device time, not host↔device round-trips
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for i in range(chain):
                px, ids, mask = inputs[i % 2]
                out = infer(variables, px, ids, mask)
            jax.block_until_ready(out)
            _ = float(out[0, 0])  # force real completion through the tunnel
            dt = time.perf_counter() - t0
            best = max(best, b * chain / dt)
        results[f"b{b}"] = round(best, 2)

        # per-call latency: block every call (includes host↔TPU link RTT)
        times = []
        for i in range(max(chain, 5)):
            px, ids, mask = inputs[i % 2]
            t0 = time.perf_counter()
            jax.block_until_ready(infer(variables, px, ids, mask))
            times.append(time.perf_counter() - t0)
        latency[f"b{b}"] = round(float(np.median(times)) * 1000, 3)

        if best > best_throughput:
            best_throughput, best_batch = best, b
        # progressive: re-emit the best-so-far line after every batch —
        # a mid-run kill still leaves the driver a parseable result
        emit(assemble(best_throughput, best_batch, results, latency,
                      flops_by_batch, {"partial": True}))

    extra = {"budget_exhausted": True} if budget_cut else {}
    line = assemble(best_throughput, best_batch, results, latency,
                    flops_by_batch, extra)

    # compact driver-visible training number in the same artifact (cache
    # already warmed for this batch above). Full fidelity (chain 10,
    # reps 3 — VERDICT r4 weak #4: quick-mode under-measured by ~25%)
    # unless the budget can't fit it (~90 s at b=256 on the chip).
    if train_b is not None and time_left() > 150.0:
        import copy

        targs = copy.copy(args)
        targs.batches = [train_b]
        # full fidelity for the real b=256 TPU number; quick-mode chains
        # suffice for the tiny CPU-backend smoke configuration
        targs.quick = train_b < 256
        targs.aug = False
        tline = bench_train(targs, print_line=False, warm=False)
        train_obj = {
            "pairs_per_sec": tline["value"],
            "batch": tline["best_batch"],
            "vs_baseline": tline["vs_baseline"],
        }
        if "mfu" in tline:
            train_obj["mfu"] = tline["mfu"]
        line["train"] = train_obj
    elif train_b is not None:
        line["train_skipped"] = "budget exhausted"
    emit(line, final=True)


if __name__ == "__main__":
    main()
    # The axon PJRT tunnel can hang the interpreter on teardown; the JSON
    # line is already flushed, so exit hard rather than risk the driver
    # timing out waiting on atexit.
    import os
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
