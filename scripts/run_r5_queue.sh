#!/bin/bash
# Round-5 sequenced TPU queue. One job touches the tunnel at a time:
#   (wait for the multi-seed ablation to finish)
#   1. 30k-request on-chip soak UNDER the recycle supervisor. Sizing: the
#      round-4 leak grew ~0.25 MB/req (~14 MB/s at 57 rps) from a ~630 MB
#      baseline; threshold 1600 MB triggers ~every 70 s of load, and 30k
#      requests (~9 min) fit >=3 full recycle cycles so the sawtooth-aware
#      pass criterion (bounded max + stationary troughs) has >=2 troughs
#      to compare. 30k also exceeds the verdict's 10k bar.
#   2. full bench.py (driver artifact dry-run; verifies the compact train
#      sub-object against the README claim, VERDICT r4 weak #4)
#   3. full pytest suite (CPU)
# Every step is timeout-bounded so the queue cannot outlive the round;
# /tmp/r5_queue.done marks completion (end-of-round hygiene: tunnel idle).
set -x
while kill -0 "$(cat /tmp/r5_ablation.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "=== 30k supervised soak (TPU) ==="
timeout 5400 python scripts/soak_test.py --requests 30000 --clients 16 \
  --supervisor-recycle-mb 1600 --out docs/SOAK_TPU.json
echo "SOAK_RC=$?"
echo "=== bench (full) ==="
timeout 3000 python bench.py > /tmp/bench_r5.json 2>/tmp/bench_r5.err
echo "BENCH_RC=$?"
tail -1 /tmp/bench_r5.json
echo "=== full pytest ==="
timeout 3600 python -m pytest tests/ -q > /tmp/pytest_r5_full.log 2>&1
echo "PYTEST_RC=$?"
tail -3 /tmp/pytest_r5_full.log
touch /tmp/r5_queue.done
echo "=== R5 QUEUE DONE ==="
