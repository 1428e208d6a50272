"""Per-shape conv backward microbenchmark: is the backward gap intrinsic?

The MFU ladder (scripts/exp_train_mfu.py) put the whole-model backward at
1.93x its roofline floor vs 1.24x for the forward, and the branch split
(scripts/exp_bwd_split.py) attributes it per encoder. This script drills
one level deeper: it times every distinct conv shape in the CustomResNet
backbone (stem + 4 stages + downsamples, weighted by how often each shape
occurs) forward and backward IN ISOLATION, against the same pure-FLOP /
HBM floors `scripts/roofline.py` uses (v5e defaults: 197 bf16 TFLOP/s,
819 GB/s).

If the per-shape backward ratios reproduce ~1.9x, the gap is intrinsic to
XLA's conv-gradient kernels at these shapes (C=64..512 lane underfill on
the transposed/flipped convs) and the book closes there; if the isolated
convs run near the forward's ratio, the gap lives between ops (BN-train
backward, fusion boundaries, residual-add cotangent traffic) instead.

Timing is tunnel-safe (see exp_train_mfu.py NOTE): only a device->host
scalar fetch synchronizes, device-sized arrays are explicit jit ARGUMENTS
(closures become HLO constants and blow the axon remote-compile limit).
The backward loss is sum(y * r) with a random cotangent argument r so XLA
cannot specialize on a ones-cotangent.

Usage: python scripts/exp_bwd_conv_micro.py [--batch 1024] [--chain 10]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

# (name, H_in, Cin, Cout, k, stride, count-per-forward) for the 224px
# backbone (vqa_tpu/models/cnn_backbone.py: stem 7x7/2 -> maxpool/2 ->
# stages [2,2,2,2] with channels 64,128,256,512, 1x1 downsample on each
# strided block).
SHAPES = [
    ("stem_7x7s2", 224, 3, 64, 7, 2, 1),
    ("s1_3x3", 56, 64, 64, 3, 1, 4),
    ("s2_3x3s2", 56, 64, 128, 3, 2, 1),
    ("s2_ds1x1s2", 56, 64, 128, 1, 2, 1),
    ("s2_3x3", 28, 128, 128, 3, 1, 3),
    ("s3_3x3s2", 28, 128, 256, 3, 2, 1),
    ("s3_ds1x1s2", 28, 128, 256, 1, 2, 1),
    ("s3_3x3", 14, 256, 256, 3, 1, 3),
    ("s4_3x3s2", 14, 256, 512, 3, 2, 1),
    ("s4_ds1x1s2", 14, 256, 512, 1, 2, 1),
    ("s4_3x3", 7, 512, 512, 3, 1, 3),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--chain", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--peak-tflops", type=float, default=197.0)
    p.add_argument("--hbm-gbps", type=float, default=819.0)
    p.add_argument("--tiny", action="store_true",
                   help="shrink batch to 4 and spatial dims 4x "
                        "(CPU sanity check of the method only)")
    args = p.parse_args()
    b = 4 if args.tiny else args.batch

    import jax
    import jax.numpy as jnp

    peak = args.peak_tflops * 1e12
    bw = args.hbm_gbps * 1e9

    def pad_for(k, stride):
        # matches _conv: torch-style pad = k//2 for 3x3/7x7, 0 for 1x1
        return k // 2

    def make_fns(k, stride):
        pad = pad_for(k, stride)
        dn = ("NHWC", "HWIO", "NHWC")

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w.astype(jnp.bfloat16), (stride, stride),
                [(pad, pad), (pad, pad)], dimension_numbers=dn,
                preferred_element_type=jnp.bfloat16)

        @jax.jit
        def f_fwd(x, w):
            return jnp.sum(conv(x, w).astype(jnp.float32))

        @jax.jit
        def f_bwd(x, w, r):
            def loss(x, w):
                return jnp.sum(conv(x, w).astype(jnp.float32) * r)
            loss_v, (dx, dw) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
            return loss_v + (jnp.sum(jnp.abs(dx).astype(jnp.float32)) +
                             jnp.sum(jnp.abs(dw))) * 0.0

        return f_fwd, f_bwd

    from vqa_tpu.utils.profiling import time_chained

    def time_it(fn, *a):
        return time_chained(fn, *a, reps=args.reps, chain=args.chain)

    key = jax.random.PRNGKey(0)
    rows = []
    tot = {"fwd_us": 0.0, "bwd_us": 0.0, "fwd_floor": 0.0, "bwd_floor": 0.0}
    for name, h, cin, cout, k, stride, count in SHAPES:
        if args.tiny:
            h = max(h // 4, k)
        ho = (h + 2 * pad_for(k, stride) - k) // stride + 1
        # Generated on device — large host transfers stall the axon tunnel.
        k1, k2, k3, key = jax.random.split(key, 4)
        x = jax.random.normal(k1, (b, h, h, cin), jnp.bfloat16)
        w = jax.random.normal(k2, (k, k, cin, cout), jnp.float32) * 0.05
        r = jax.random.normal(k3, (b, ho, ho, cout), jnp.bfloat16)
        f_fwd, f_bwd = make_fns(k, stride)
        _ = float(f_fwd(x, w)); _ = float(f_bwd(x, w, r))  # compile
        t_f = time_it(f_fwd, x, w)
        t_b = time_it(f_bwd, x, w, r) - t_f  # backward-only increment

        flops_f = 2.0 * b * ho * ho * k * k * cin * cout
        # dx: cotangent (b,ho,ho,cout) x flipped w -> same FLOPs as fwd;
        # dw: x correlated with cotangent -> same FLOPs again.
        flops_b = 2.0 * flops_f
        bytes_f = 2 * (x.size + w.size * 2 + b * ho * ho * cout)
        # bwd reads r, x, w; writes dx (bf16) + dw (f32)
        bytes_b = 2 * (r.size + x.size + w.size * 2) + (
            2 * x.size + 4 * w.size)
        floor_f = max(flops_f / peak, bytes_f / bw) * 1e6
        floor_b = max(flops_b / peak, bytes_b / bw) * 1e6
        row = {
            "shape": name, "count": count,
            "fwd_us": round(t_f * 1e6, 1), "bwd_us": round(t_b * 1e6, 1),
            "fwd_floor_us": round(floor_f, 1),
            "bwd_floor_us": round(floor_b, 1),
            "fwd_ratio": round(t_f * 1e6 / floor_f, 2),
            "bwd_ratio": round(t_b * 1e6 / floor_b, 2),
            "bwd_over_fwd": round(t_b / t_f, 2) if t_f > 0 else None,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        for key_, v in (("fwd_us", t_f * 1e6), ("bwd_us", t_b * 1e6),
                        ("fwd_floor", floor_f), ("bwd_floor", floor_b)):
            tot[key_] += v * count

    summary = {
        "b": b,
        "sum_fwd_us_per_pair": round(tot["fwd_us"] / b, 2),
        "sum_bwd_us_per_pair": round(tot["bwd_us"] / b, 2),
        "sum_fwd_ratio": round(tot["fwd_us"] / tot["fwd_floor"], 2),
        "sum_bwd_ratio": round(tot["bwd_us"] / tot["bwd_floor"], 2),
    }
    print(json.dumps({"result": summary}))


if __name__ == "__main__":
    main()
