"""BN-train backward premium: how much of the backward gap is BatchNorm?

Companion to scripts/exp_bwd_conv_micro.py. If the per-shape conv
microbenchmark shows isolated conv backwards running near the forward's
ratio-over-floor, the whole-model backward gap (1.93x floor vs 1.24x for
the forward, scripts/exp_train_mfu.py) must live BETWEEN the convs —
prime suspect: BatchNorm in train mode. BN-train's backward adds two
spatial reductions per layer (d/dmean, d/dvar) plus f32 stat traffic that
breaks XLA fusion chains the eval-mode affine BN keeps fused.

Method: time the image encoder (CustomResNet, the branch holding ~80% of
the backward per scripts/exp_bwd_split.py) forward and value_and_grad
under (a) train-mode BN (batch stats, mutable) and (b) frozen BN
(running stats — same conv FLOPs, BN is a fused affine). The premium

    [vag_train - fwd_train] - [vag_frozen - fwd_frozen]

is the backward-side cost attributable to BN-train semantics (both
brackets share identical conv gradients). Tunnel-safe timing: only a
device->host scalar fetch synchronizes; device-sized arrays are jit
ARGUMENTS, not closures (axon remote-compile 413 limit, see
exp_train_mfu.py NOTE).

Usage: python scripts/exp_bwd_bn.py [--batch 1024] [--chain 10]
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

    from vqa_tpu.models.cnn_backbone import CustomResNet
    from vqa_tpu.utils.config import MODEL, tiny_model_config

    mc = tiny_model_config() if args.tiny else MODEL
    img_size = mc.image_size
    model = CustomResNet(
        in_channels=mc.in_channels,
        base_channels=mc.base_channels,
        stage_channels=tuple(mc.stage_channels),
        num_blocks=tuple(mc.blocks_per_stage),
        use_se=mc.use_se_attention,
        use_spatial=mc.use_spatial_attention,
        se_reduction=mc.se_reduction,
        dtype=jnp.bfloat16,
    )

    from vqa_tpu.utils.profiling import device_synthetic_inputs

    b = args.batch
    # Generated on device — a 616 MB host transfer stalls the axon tunnel.
    imgs, _, _, _ = device_synthetic_inputs(b, image_size=img_size)
    init_fn = jax.jit(lambda r, x: model.init(r, x, train=True))
    variables = init_fn(jax.random.PRNGKey(0), imgs[:1])
    params, batch_stats = variables["params"], variables["batch_stats"]

    def loss_train(p_, stats, imgs):
        feats, _ = model.apply(
            {"params": p_, "batch_stats": stats}, imgs, train=True,
            mutable=["batch_stats"])
        return jnp.sum(feats.astype(jnp.float32))

    def loss_frozen(p_, stats, imgs):
        feats = model.apply(
            {"params": p_, "batch_stats": stats}, imgs, train=False)
        return jnp.sum(feats.astype(jnp.float32))

    def vag(loss):
        def f(p_, stats, imgs):
            l, g = jax.value_and_grad(loss)(p_, stats, imgs)
            # fold grads into ONE scalar; only a device->host fetch syncs
            return l + sum(jnp.sum(jnp.abs(x)) * 0.0
                           for x in jax.tree.leaves(g))
        return jax.jit(f)

    from vqa_tpu.utils.profiling import time_chained

    def time_it(fn, *a):
        return time_chained(fn, *a, reps=args.reps, chain=args.chain)

    out = {"b": b}
    times = {}
    for name, loss in (("train", loss_train), ("frozen", loss_frozen)):
        f_fwd = jax.jit(loss)
        f_vag = vag(loss)
        _ = float(f_fwd(params, batch_stats, imgs))  # compile
        _ = float(f_vag(params, batch_stats, imgs))
        t_f = time_it(f_fwd, params, batch_stats, imgs)
        t_v = time_it(f_vag, params, batch_stats, imgs)
        times[name] = (t_f, t_v)
        out[name] = {
            "fwd_ms": round(t_f * 1e3, 3),
            "vag_ms": round(t_v * 1e3, 3),
            "bwd_us_per_pair": round((t_v - t_f) / b * 1e6, 2),
        }
        print(json.dumps({name: out[name]}), flush=True)

    bwd_train = times["train"][1] - times["train"][0]
    bwd_frozen = times["frozen"][1] - times["frozen"][0]
    out["bn_bwd_premium_us_per_pair"] = round(
        (bwd_train - bwd_frozen) / b * 1e6, 2)
    print(json.dumps({"result": out}))


if __name__ == "__main__":
    main()
