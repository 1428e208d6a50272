#!/bin/bash
# Round-3 TPU-blocked work queue (memory: round3-remaining-queue).
# Run when the axon tunnel is back: bash scripts/run_tpu_queue.sh
# Each step saves raw JSON-lines output under /tmp/tpuq/ for the
# docs/PERF.md + CHANGELOG write-ups; steps are independent, a failure
# stops the queue so the state is inspectable.
# Steps are independent: run every one even if an earlier one times out
# (a b=1024 backward compile over the remote-compile tunnel can exceed any
# single budget; partial JSON lines are still usable). pipefail so a
# timed-out step is visible in the per-step rc log.
set -o pipefail
mkdir -p /tmp/tpuq
cd "$(dirname "$0")/.."
# vqa_tpu is run from the source tree, not pip-installed; scripts executed as
# `python -u scripts/x.py` get sys.path[0]=scripts/, so make the repo root importable.
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

echo "== 1/6 bwd split (b=1024)" >&2
timeout 3600 python -u scripts/exp_bwd_split.py --batch 1024 \
  | tee /tmp/tpuq/bwd_split.json || echo "STEP FAILED rc=$?" >&2

echo "== 2/6 bwd remat ladder (b=1024)" >&2
timeout 3600 python -u scripts/exp_bwd_remat.py --batch 1024 \
  | tee /tmp/tpuq/bwd_remat.json || echo "STEP FAILED rc=$?" >&2

echo "== 3/6 per-shape conv micro (b=1024)" >&2
timeout 3600 python -u scripts/exp_bwd_conv_micro.py --batch 1024 \
  | tee /tmp/tpuq/bwd_conv_micro.json || echo "STEP FAILED rc=$?" >&2

echo "== 4/6 BN-train backward premium (b=1024)" >&2
timeout 3600 python -u scripts/exp_bwd_bn.py --batch 1024 \
  | tee /tmp/tpuq/bwd_bn.json || echo "STEP FAILED rc=$?" >&2

echo "== 5/6 serving soak 10k x 16 clients (full-size engine)" >&2
timeout 3600 python -u scripts/soak_test.py --requests 10000 --clients 16 \
  | tee /tmp/tpuq/soak.log || echo "STEP FAILED rc=$?" >&2

echo "== 6/6 bench sanity" >&2
timeout 1800 python -u bench.py | tee /tmp/tpuq/bench.json || echo "STEP FAILED rc=$?" >&2

echo "QUEUE DONE" >&2
