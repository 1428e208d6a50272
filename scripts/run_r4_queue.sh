#!/bin/bash
# Round-4 follow-up queue: runs AFTER scripts/run_h2h_campaign.sh finishes
# (waits on its pid file), then serializes the remaining on-chip work so
# nothing shares the axon tunnel concurrently:
#
#   1. h2h_report.py        -> docs/HEAD_TO_HEAD.md from the campaign JSONs
#   2. 10k-request soak     -> docs/SOAK_TPU.json (RSS plateau, VERDICT #2)
#   3. cold-cache bench     -> /tmp/bench_cold.json (VERDICT #3 done-check)
#   4. full pytest suite    -> /tmp/pytest_r4_full.log
#
# Steps are independent: a failure is logged and the queue continues.
set -o pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

if [ -f /tmp/h2h.pid ]; then
  pid=$(cat /tmp/h2h.pid)
  echo "waiting for h2h campaign (pid $pid)..." >&2
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
fi
echo "== queue: campaign done, generating report" >&2
python scripts/h2h_report.py || echo "STEP FAILED: h2h_report rc=$?" >&2

echo "== queue: 10k on-chip soak" >&2
timeout 5400 python scripts/soak_test.py --requests 10000 --clients 16 \
  --out docs/SOAK_TPU.json || echo "STEP FAILED: soak rc=$?" >&2

echo "== queue: cold-cache bench (empty XLA cache via VQA_COMPILE_CACHE)" >&2
# point the compile cache at an empty dir so every program compiles fresh
# through the probe watchdogs; the warm .jax_cache stays intact for the
# driver's round-end bench run
rm -rf /tmp/cold_cache && mkdir -p /tmp/cold_cache
VQA_COMPILE_CACHE=/tmp/cold_cache timeout 5400 python bench.py \
  > /tmp/bench_cold.json || echo "STEP FAILED: cold bench rc=$?" >&2
cat /tmp/bench_cold.json >&2

echo "== queue: full test suite" >&2
timeout 3600 python -m pytest tests/ -x -q > /tmp/pytest_r4_full.log 2>&1 \
  || echo "STEP FAILED: pytest rc=$?" >&2
tail -3 /tmp/pytest_r4_full.log >&2

echo "R4 QUEUE DONE" >&2
