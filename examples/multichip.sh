#!/usr/bin/env bash
# Multi-chip training is a config change: the same CLI run data-parallel,
# tensor-parallel, or both. No code changes, no different entry point.
#
# On a real pod each host runs the same command (jax.distributed.initialize
# is driven by env vars / --coordinator flags; see vqa_tpu/parallel/
# distributed.py). Here we demonstrate on CPU with 8 virtual devices
# (--platform/--virtual-devices use the jax config API, which works even
# where a PJRT plugin ignores the JAX_PLATFORMS env var).
set -euo pipefail

# 8-way data parallel
python -m vqa_tpu.training.train --demo --tiny --epochs 1 --batch-size 16 \
    --platform cpu --virtual-devices 8 --data-parallel 8 --no-save

# 4-way data x 2-way tensor parallel (Megatron-style paired sharding rules,
# XLA inserts the collectives over ICI)
python -m vqa_tpu.training.train --demo --tiny --epochs 1 --batch-size 16 \
    --platform cpu --virtual-devices 8 \
    --data-parallel 4 --model-parallel 2 --no-save

# evaluation shards the same way
# python -m vqa_tpu.training.evaluate --checkpoint-dir checkpoints --demo \
#     --platform cpu --virtual-devices 8 --data-parallel 8

# serving too: bucket batches shard over the chips (dpN ≡ single-device)
# python -m vqa_tpu.serving.server --checkpoint-dir checkpoints \
#     --platform cpu --virtual-devices 8 --data-parallel 8
