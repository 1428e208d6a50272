"""Backward-pass remat experiment: trade recompute FLOPs for HBM traffic.

The MFU ladder (scripts/exp_train_mfu.py) puts the backward at
~113 µs/pair (b=1024), 2.66x the forward — part of that is the forward
saving residuals to HBM for the backward to re-read. `jax.checkpoint`
policies change that trade:

  base       no remat (the shipped train step's policy)
  full       nothing_saveable — backward recomputes the whole forward
  stages     save_only_these_names(resnet_stem, resnet_stage1..4) — keep
             only stage-boundary activations, rematerialize the interiors
             (tags: vqa_tpu/models/cnn_backbone.py checkpoint_name calls)
  dots       dots_with_no_batch_dims_saveable — save matmul outputs only
             (tests whether convs count as dots for this policy on TPU)

Each variant times value_and_grad of the full train loss with the same
tunnel-safe scalar-fetch methodology as the ladder. Writes JSON lines to
stdout; the winner (if any) gets wired into make_train_step behind a
config flag with the measurement recorded in docs/PERF.md.

Usage: python scripts/exp_bwd_remat.py [--batch 1024] [--chain 10]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--chain", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--variants", default="base,full,stages,dots")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model (CPU sanity check of the method only)")
    args = p.parse_args()
    known = ("base", "full", "stages", "dots")
    bad = [v for v in args.variants.split(",") if v not in known]
    if bad:  # fail BEFORE the expensive full-model init/compile
        p.error(f"unknown --variants {bad}; choose from {known}")

    import jax
    import jax.numpy as jnp
    import optax

    from vqa_tpu.models import create_vqa_model, init_vqa_model

    if args.tiny:
        from vqa_tpu.utils.config import tiny_model_config
        mc = tiny_model_config()
        model = create_vqa_model(config=mc, dtype=jnp.bfloat16)
        img_size, qlen, vocab, n_ans = (
            mc.image_size, mc.max_question_length, mc.vocab_size,
            mc.num_answers)
    else:
        model = create_vqa_model(dtype=jnp.bfloat16)
        img_size, qlen, vocab, n_ans = 224, 20, 10000, 1000
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    params, batch_stats = variables["params"], variables["batch_stats"]

    from vqa_tpu.utils.profiling import device_synthetic_inputs

    b = args.batch
    # Generated on device — a 616 MB host transfer stalls the axon tunnel.
    imgs, ids, mask, labels = device_synthetic_inputs(
        b, image_size=img_size, qlen=qlen, vocab_size=vocab,
        num_answers=n_ans)
    key = jax.random.PRNGKey(0)

    # NOTE: device-sized arrays are explicit jit ARGUMENTS — a closed-over
    # array becomes an HLO constant, and at b=1024 the 616 MB image literal
    # blows the axon remote-compile request limit (HTTP 413).
    def loss_of(p, imgs, ids, mask, labels):
        (logits, _), _ = model.apply(
            {"params": p, "batch_stats": batch_stats},
            imgs, ids, mask, train=True, mutable=["batch_stats"],
            rngs={"dropout": key},
        )
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    cp = jax.checkpoint_policies
    POLICIES = {
        "base": None,  # plain value_and_grad, no remat
        "full": cp.nothing_saveable,
        "stages": cp.save_only_these_names(
            "resnet_stem", "resnet_stage1", "resnet_stage2",
            "resnet_stage3", "resnet_stage4"),
        "dots": cp.dots_with_no_batch_dims_saveable,
    }

    def make_fn(policy):
        fn = loss_of if policy is None else jax.checkpoint(
            loss_of, policy=policy)

        @jax.jit
        def grads(p, imgs, ids, mask, labels):
            loss, g = jax.value_and_grad(fn)(p, imgs, ids, mask, labels)
            # fold grads into ONE scalar: over the axon tunnel only a
            # device->host fetch synchronizes (see exp_train_mfu.py NOTE).
            return loss + sum(jnp.sum(jnp.abs(x)) * 0.0
                              for x in jax.tree.leaves(g))
        return grads

    from vqa_tpu.utils.profiling import time_chained

    def time_it(fn, *a):
        return time_chained(fn, *a, reps=args.reps, chain=args.chain)

    data = (imgs, ids, mask, labels)
    out = {"b": b}
    # anchor numerics to the TRUE no-remat baseline regardless of which
    # --variants run (otherwise the first variant trivially "matches")
    base_loss = float(make_fn(POLICIES["base"])(params, *data))
    for name in args.variants.split(","):
        fn = make_fn(POLICIES[name])
        loss = float(fn(params, *data))  # compile + numerics check
        t = time_it(fn, params, *data)
        out[name] = {
            "grads_ms": round(t * 1e3, 3),
            "us_per_pair": round(t / b * 1e6, 2),
            "loss": round(loss, 6),
            # bf16 fusion-order noise under remat is ~1e-3; anything
            # beyond 5e-3 would mean the policy changed the math.
            "loss_matches_base": abs(loss - base_loss) < 5e-3,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"result": out}))


if __name__ == "__main__":
    main()
