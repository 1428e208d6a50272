#!/bin/bash
# Head-to-head offset-localization campaign (VERDICT r4 #4).
#
# The round-3 head-to-head showed our train loss sitting ~0.2 nats above the
# reference's from epoch 3 on (same val top-1 range). Hypothesis: the
# schedules differ in granularity — the reference steps CosineAnnealingLR
# once per EPOCH (reference: training/train.py:139-143,352) while our cosine
# decays every STEP, so mid-training our LR is up to half an epoch further
# down the curve. This campaign isolates the cause with controlled runs,
# then measures the headline equivalence with 8 seeds per side.
#
#   usage: bash scripts/run_h2h_campaign.sh [corpus] [subset] [epochs]
#
# Stages (all seed 42 unless noted; artifacts under docs/):
#   O1  ours defaults (step cosine)            -> h2h_s42_step.json
#   O2  ours --lr-schedule epoch               -> h2h_s42_epoch.json
#   O3  O2 + --init-from-ref (identical init)  -> h2h_s42_epoch_refinit.json
#   C4  dropout 0 both sides + epoch + refinit -> h2h_s42_controlled.json
#   S*  8-seed spread, defaults both sides     -> h2h_seed{N}.json
#
# The reference side is expensive (~15 min/run on this 1-core host), so the
# seed-42 reference run is executed ONCE (by O1, which also dumps the
# epoch-0 init) and reused by O2/O3 via --skip-reference (state JSONs are
# copied to each tag's filename). C4 needs its own reference run (dropout
# changes the reference model). Each seed needs its own reference run.
set -o pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

CORPUS="${1:-data/vqa_synth}"
SUBSET="${2:-1000}"
EPOCHS="${3:-8}"
COMMON=(--corpus "$CORPUS" --subset "$SUBSET" --epochs "$EPOCHS")

run() { echo "== h2h $*" >&2; timeout 5400 python -u scripts/head_to_head.py "$@" || echo "STEP FAILED rc=$?" >&2; }

# O1: defaults; trains the reference once, dumps its epoch-0 init
run "${COMMON[@]}" --seed 42 --tag s42_step --init-from-ref

# O2/O3 reuse the O1 reference artifacts under their own tag names
for tag in s42_epoch s42_epoch_refinit; do
  cp docs/head_to_head_ref_s42_step.json "docs/head_to_head_ref_${tag}.json"
  cp docs/head_to_head_ref_best_s42_step.pth "docs/head_to_head_ref_best_${tag}.pth"
  cp docs/head_to_head_ref_init_s42_step.pth "docs/head_to_head_ref_init_${tag}.pth"
done
run "${COMMON[@]}" --seed 42 --tag s42_epoch --lr-schedule epoch --skip-reference
run "${COMMON[@]}" --seed 42 --tag s42_epoch_refinit --lr-schedule epoch \
    --init-from-ref --skip-reference

# C4: dropout disabled on BOTH sides (new reference run), identical init,
# epoch schedule — the maximally-controlled pair
run "${COMMON[@]}" --seed 42 --tag s42_controlled --dropout 0.0 \
    --answer-dropout 0.0 --lr-schedule epoch --init-from-ref

# Seed spread: 8 seeds per side, framework defaults (step cosine, own init)
for seed in 1 2 3 5 6 7 11 42; do
  if [ "$seed" = 42 ]; then
    # reuse O1's reference run for seed 42
    cp docs/head_to_head_ref_s42_step.json docs/head_to_head_ref_seed42.json
    cp docs/head_to_head_ref_best_s42_step.pth docs/head_to_head_ref_best_seed42.pth
    run "${COMMON[@]}" --seed 42 --tag seed42 --skip-reference
  else
    run "${COMMON[@]}" --seed "$seed" --tag "seed${seed}"
  fi
done

echo "CAMPAIGN DONE" >&2
