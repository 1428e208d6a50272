#!/bin/bash
# Round-3 TPU-blocked work queue (memory: round3-remaining-queue).
# Run when the axon tunnel is back: bash scripts/run_tpu_queue.sh
# Each step saves raw JSON-lines output under /tmp/tpuq/ for the
# docs/PERF.md + CHANGELOG write-ups; steps are independent, a failure
# stops the queue so the state is inspectable.
set -e -o pipefail  # pipefail: a failed/timed-out step must not be masked by tee
mkdir -p /tmp/tpuq
cd "$(dirname "$0")/.."
# vqa_tpu is run from the source tree, not pip-installed; scripts executed as
# `python scripts/x.py` get sys.path[0]=scripts/, so make the repo root importable.
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

echo "== 1/6 bwd split (b=1024)" >&2
timeout 1200 python scripts/exp_bwd_split.py --batch 1024 \
  | tee /tmp/tpuq/bwd_split.json

echo "== 2/6 bwd remat ladder (b=1024)" >&2
timeout 1800 python scripts/exp_bwd_remat.py --batch 1024 \
  | tee /tmp/tpuq/bwd_remat.json

echo "== 3/6 per-shape conv micro (b=1024)" >&2
timeout 1800 python scripts/exp_bwd_conv_micro.py --batch 1024 \
  | tee /tmp/tpuq/bwd_conv_micro.json

echo "== 4/6 BN-train backward premium (b=1024)" >&2
timeout 1200 python scripts/exp_bwd_bn.py --batch 1024 \
  | tee /tmp/tpuq/bwd_bn.json

echo "== 5/6 serving soak 10k x 16 clients (full-size engine)" >&2
timeout 3600 python scripts/soak_test.py --requests 10000 --clients 16 \
  | tee /tmp/tpuq/soak.log

echo "== 6/6 bench sanity" >&2
timeout 1800 python bench.py | tee /tmp/tpuq/bench.json

echo "QUEUE DONE" >&2
