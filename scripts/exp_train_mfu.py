"""Training-step MFU decomposition: where do the microseconds go?

Times, on the same chip and batch, a ladder of jitted programs that
bracket the full train step:

  fwd_eval   forward, train=False (inference program, no BN stats)
  fwd_train  forward, train=True, BN batch stats mutated + CE loss
  grads      value_and_grad of the train loss (fwd + bwd, no update)
  full       the shipped train step (fwd + bwd + AdamW + BN-EMA, donated)
  mu_bf16    full step with AdamW's first moment in bf16 (optax mu_dtype)
             — halves the m-state HBM traffic, a candidate optimization

Differences isolate: backward = grads - fwd_train; optimizer update =
full - grads; BN-train overhead = fwd_train - fwd_eval. Compare against
scripts/roofline.py --train floors. Writes JSON to stdout.

Usage: python scripts/exp_train_mfu.py [--batches 256,1024] [--chain 10]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="256,1024")
    p.add_argument("--chain", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vqa_tpu.models import create_vqa_model, init_vqa_model
    from vqa_tpu.training.train import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from vqa_tpu.utils.config import TrainingConfig
    from vqa_tpu.utils.profiling import time_chained

    model = create_vqa_model(dtype=jnp.bfloat16)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    tx, _ = make_optimizer(TrainingConfig(), steps_per_epoch=100)
    train_step = make_train_step(model)

    # mu_bf16 variant: same chain but adamw(mu_dtype=bf16)
    cfg = TrainingConfig()
    tx_mu16 = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2,
                    weight_decay=cfg.weight_decay, mu_dtype=jnp.bfloat16),
    )
    # flat variant: optax.flatten ravels grads/state into ONE buffer so the
    # clip+AdamW update is a handful of big fused kernels instead of ~7
    # passes over each of the ~160 small param tensors (per-tensor kernel
    # overhead is the suspected gap vs the ~3 µs/pair update floor).
    tx_flat = optax.flatten(optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2,
                    weight_decay=cfg.weight_decay),
    ))

    # NOTE: every timed program returns a SCALAR that the timing loop
    # float()s. Over the axon tunnel, jax.block_until_ready() returns as
    # soon as the execution is enqueued, not when it completes (measured:
    # a b=256 forward "finished" in 0.12 ms, 100x faster than the device
    # could run it) — only a device→host fetch actually synchronizes.
    @jax.jit
    def fwd_eval(params, batch_stats, images, ids, mask):
        logits, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, ids, mask, train=False,
        )
        return jnp.sum(logits)

    @jax.jit
    def fwd_train(params, batch_stats, images, ids, mask, labels, rng):
        (logits, _), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, ids, mask, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        return loss, mutated["batch_stats"]

    @jax.jit
    def grads_only(params, batch_stats, images, ids, mask, labels, rng):
        def loss_fn(p):
            (logits, _), mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images, ids, mask, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            return loss, mutated["batch_stats"]
        (loss, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, g

    from vqa_tpu.utils.profiling import device_synthetic_inputs

    key = jax.random.PRNGKey(0)
    out = {}
    for b in [int(x) for x in args.batches.split(",")]:
        # Generated on device — a 616 MB host transfer stalls the tunnel.
        imgs, ids, mask, labels = device_synthetic_inputs(b)

        def fresh_state(t=tx):
            return TrainState.create(
                apply_fn=model.apply,
                params=jax.tree.map(jnp.copy, variables["params"]),
                tx=t,
                batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            )

        def time_it(fn, *a):
            # shared tunnel-safe primitive: float() of a scalar output is
            # the only reliable sync (see NOTE above); fetching the loss
            # also waits for bwd/update since outputs only materialize
            # when the whole executable finishes.
            return time_chained(fn, *a, reps=args.reps, chain=args.chain)

        res = {}
        # compile passes first
        _ = jax.block_until_ready(
            fwd_eval(variables["params"], variables["batch_stats"],
                     imgs, ids, mask))
        res["fwd_eval"] = time_it(
            fwd_eval, variables["params"], variables["batch_stats"],
            imgs, ids, mask)
        _ = jax.block_until_ready(
            fwd_train(variables["params"], variables["batch_stats"],
                      imgs, ids, mask, labels, key)[0])
        res["fwd_train"] = time_it(
            fwd_train, variables["params"], variables["batch_stats"],
            imgs, ids, mask, labels, key)
        _ = jax.block_until_ready(
            grads_only(variables["params"], variables["batch_stats"],
                       imgs, ids, mask, labels, key)[0])
        res["grads"] = time_it(
            grads_only, variables["params"], variables["batch_stats"],
            imgs, ids, mask, labels, key)

        for name, t in (("full", tx), ("mu_bf16", tx_mu16),
                        ("flat", tx_flat)):
            step = train_step if name == "full" else make_train_step(model)
            st = fresh_state(t)
            st, m = step(st, imgs, ids, mask, labels, key)  # compile
            st, m = step(st, imgs, ids, mask, labels, key)
            jax.block_until_ready(m)
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                for i in range(args.chain):
                    st, m = step(st, imgs, ids, mask, labels, key)
                jax.block_until_ready(m)
                _ = float(m["loss"])
                best = min(best, (time.perf_counter() - t0) / args.chain)
            res[name] = best

        out[f"b{b}"] = {
            **{k: round(v * 1e3, 3) for k, v in res.items()},
            "pairs_per_sec_full": round(b / res["full"], 1),
            "pairs_per_sec_mu_bf16": round(b / res["mu_bf16"], 1),
            "pairs_per_sec_flat": round(b / res["flat"], 1),
            "derived_us_per_pair": {
                "fwd_eval": round(res["fwd_eval"] / b * 1e6, 2),
                "bn_train_extra": round(
                    (res["fwd_train"] - res["fwd_eval"]) / b * 1e6, 2),
                "backward": round(
                    (res["grads"] - res["fwd_train"]) / b * 1e6, 2),
                "update": round((res["full"] - res["grads"]) / b * 1e6, 2),
            },
        }
        print(json.dumps({f"b{b}": out[f"b{b}"]}), flush=True)
    print(json.dumps({"result": out}))


if __name__ == "__main__":
    main()
