"""Backward-pass cost split: which branch's backward eats the time?

The MFU ladder (scripts/exp_train_mfu.py) measured the backward at
~114 µs/pair (b=1024) = 0.33 MFU vs the forward's 0.46 — the single
largest train-step inefficiency. This script localizes it by timing
`jax.grad` restricted to one top-level param subtree at a time: XLA
dead-code-eliminates the backward of every subtree whose grads are not
requested (the forward still runs in full), so

    t(grads[branch]) - t(fwd)  ≈  backward cost attributable to branch

(plus the shared loss/fusion cotangent chain, which is tiny). Subtrees:
image_encoder (11.2M params, all convs), text_encoder (5.7M),
fusion+answer_head (2.4M). Same tunnel-safe scalar-fetch timing as the
ladder. Writes JSON to stdout.

Usage: python scripts/exp_bwd_split.py [--batch 1024] [--chain 10]
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
    p.add_argument("--tiny", action="store_true",
                   help="tiny model (CPU sanity check of the method only)")
    args = p.parse_args()

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

    # NOTE: every device-sized array is an explicit jit ARGUMENT — a
    # closed-over array becomes an HLO constant, and at b=1024 the 616 MB
    # image literal blows the axon remote-compile request limit (HTTP 413).
    def loss_of(full_params, imgs, ids, mask, labels):
        (logits, _), _ = model.apply(
            {"params": full_params, "batch_stats": batch_stats},
            imgs, ids, mask, train=True, mutable=["batch_stats"],
            rngs={"dropout": key},
        )
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    SPLITS = {
        "image_encoder": ("image_encoder",),
        "text_encoder": ("text_encoder",),
        "fusion+head": ("fusion", "answer_head"),
    }

    def make_grads_fn(keys):
        @jax.jit
        def f(sub, rest, imgs, ids, mask, labels):
            def loss_fn(s):
                return loss_of({**rest, **s}, imgs, ids, mask, labels)
            loss, g = jax.value_and_grad(loss_fn)(sub)
            # fold the grads into the output so nothing is DCE'd, but
            # return ONE scalar: over the axon tunnel only a device→host
            # fetch synchronizes (see exp_train_mfu.py NOTE).
            return loss + sum(jnp.sum(jnp.abs(x)) * 0.0
                              for x in jax.tree.leaves(g))
        sub = {k: params[k] for k in keys}
        rest = {k: v for k, v in params.items() if k not in keys}
        return f, sub, rest

    fwd_only = jax.jit(loss_of)

    from vqa_tpu.utils.profiling import time_chained

    def time_it(fn, *a):
        return time_chained(fn, *a, reps=args.reps, chain=args.chain)

    data = (imgs, ids, mask, labels)
    _ = float(fwd_only(params, *data))  # compile
    t_fwd = time_it(fwd_only, params, *data)
    out = {"b": b, "fwd_train_ms": round(t_fwd * 1e3, 3)}
    us = {"fwd_train": round(t_fwd / b * 1e6, 2)}
    for name, keys in SPLITS.items():
        f, sub, rest = make_grads_fn(keys)
        _ = float(f(sub, rest, *data))  # compile
        t = time_it(f, sub, rest, *data)
        out[f"grads_{name}_ms"] = round(t * 1e3, 3)
        us[f"bwd_{name}"] = round((t - t_fwd) / b * 1e6, 2)
        print(json.dumps({f"grads_{name}_ms": out[f"grads_{name}_ms"]}),
              flush=True)
    out["derived_us_per_pair"] = us
    print(json.dumps(out))


if __name__ == "__main__":
    main()
