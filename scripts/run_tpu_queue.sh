#!/bin/bash
# TPU-blocked work queue. Run when the axon tunnel is back:
#   bash scripts/run_tpu_queue.sh
# Each step saves raw JSON-lines output under /tmp/tpuq/ for the
# docs/PERF.md + CHANGELOG write-ups. Steps are independent and the queue
# continues past a failed/timed-out step (partial JSON lines are still
# usable); pipefail so a timed-out step is visible in the per-step rc log.
#
# Backward-pass steps run at --batch 256: docs/PERF.md documents that the
# exp_bwd_* programs hang indefinitely at b=1024 when compiled fresh over
# the remote-compile transport (idle sockets, reproduced 3x), and the
# published docs/BWD_LOCALIZATION.json numbers were measured at b=256.
# Set TPUQ_B1024=1 to additionally try the b=1024 variants under a short
# (900 s) budget after the b=256 runs complete.
set -o pipefail
mkdir -p /tmp/tpuq
cd "$(dirname "$0")/.."
# vqa_tpu is run from the source tree, not pip-installed; scripts executed as
# `python -u scripts/x.py` get sys.path[0]=scripts/, so make the repo root importable.
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

echo "== 1/6 bwd split (b=256)" >&2
timeout 1800 python -u scripts/exp_bwd_split.py --batch 256 \
  | tee /tmp/tpuq/bwd_split.json || echo "STEP FAILED rc=$?" >&2

echo "== 2/6 bwd remat ladder (b=256)" >&2
timeout 1800 python -u scripts/exp_bwd_remat.py --batch 256 \
  | tee /tmp/tpuq/bwd_remat.json || echo "STEP FAILED rc=$?" >&2

echo "== 3/6 per-shape conv micro (b=256)" >&2
timeout 1800 python -u scripts/exp_bwd_conv_micro.py --batch 256 \
  | tee /tmp/tpuq/bwd_conv_micro.json || echo "STEP FAILED rc=$?" >&2

echo "== 4/6 BN-train backward premium (b=256)" >&2
timeout 1800 python -u scripts/exp_bwd_bn.py --batch 256 \
  | tee /tmp/tpuq/bwd_bn.json || echo "STEP FAILED rc=$?" >&2

if [ -n "$TPUQ_B1024" ]; then
  for exp in bwd_split bwd_remat bwd_conv_micro bwd_bn; do
    echo "== extra: $exp (b=1024, 900 s budget)" >&2
    timeout 900 python -u "scripts/exp_${exp}.py" --batch 1024 \
      | tee "/tmp/tpuq/${exp}_b1024.json" || echo "STEP FAILED rc=$?" >&2
  done
fi

echo "== 5/7 serving soak 10k x 16 clients (full-size engine, RSS plateau)" >&2
timeout 3600 python -u scripts/soak_test.py --requests 10000 --clients 16 \
  --out docs/SOAK_TPU.json \
  | tee /tmp/tpuq/soak.log || echo "STEP FAILED rc=$?" >&2

echo "== 6/7 bench sanity" >&2
timeout 1800 python -u bench.py | tee /tmp/tpuq/bench.json || echo "STEP FAILED rc=$?" >&2

echo "== 7/7 bench from a COLD compile cache (VERDICT r4 #3 acceptance)" >&2
# empty temp cache dir: proves the probe machinery survives fresh b=1024
# compiles (or degrades to skipped_batches) without touching .jax_cache/
rm -rf /tmp/tpuq/coldcache && mkdir -p /tmp/tpuq/coldcache
VQA_COMPILE_CACHE=/tmp/tpuq/coldcache timeout 5400 python -u bench.py \
  | tee /tmp/tpuq/bench_cold.json || echo "STEP FAILED rc=$?" >&2

echo "QUEUE DONE" >&2
