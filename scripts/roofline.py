"""Roofline accounting for the VQA forward AND training step: per-stage
FLOPs and HBM traffic → compute-bound vs bandwidth-bound time floors.

Explains the measured end-to-end numbers (bench.py / bench.py --train)
from first principles: step time ≈ compute time + activation traffic time
(XLA does not fuse across conv boundaries, so every conv output
round-trips HBM once at batch sizes past the cache).

Training model (--train; no remat is used — see make_train_step in
vqa_tpu/training/train.py):
  * FLOPs: each conv runs 3× (forward, dL/dX transposed conv, dL/dW
    correlation), except the stem conv whose dL/dX is never needed
    (input is data). Non-conv (text/fusion/head) matmuls also ×3.
  * Activation traffic: forward writes every conv output once and the
    next op reads it (the inference accounting); backward re-reads the
    saved input activation (for dW), reads the incoming output-grad and
    writes the input-grad: ≈ 2·in_elems + out_elems extra per conv.
  * Parameter-side traffic per STEP (amortized by batch): f32 grads are
    written by the backward and read by the update (2·P·4 bytes); AdamW
    reads and writes params + m + v (6·P·4 bytes).

Usage: python scripts/roofline.py [--train] [--batch 1024]
       [--peak-tflops 197] [--hbm-gbps 819] [--measured-pairs-per-sec N]
"""

from __future__ import annotations

import argparse

N_PARAMS = 19_310_316  # full model, vocab=10k (tests/test_models.py)


def conv_cost(h, w, k, cin, cout, stride=1):
    """(flops, out_elems, in_elems) for one conv at [h,w,cin] input."""
    oh, ow = h // stride, w // stride
    return 2 * oh * ow * k * k * cin * cout, oh * ow * cout, h * w * cin


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--train", action="store_true",
                   help="account the full train step (fwd+bwd+AdamW)")
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="bf16 dense peak (v5e)")
    p.add_argument("--hbm-gbps", type=float, default=819.0, help="v5e HBM BW")
    p.add_argument("--measured-pairs-per-sec", type=float, default=None)
    args = p.parse_args()

    BYTES = 2  # bf16 activations
    rows = []  # (name, fwd_f, fwd_bytes, bwd_f, bwd_bytes)

    def add(name, flops, traffic_elems, bwd_flops=None, bwd_elems=None):
        rows.append((name, flops, traffic_elems * BYTES,
                     bwd_flops or 0, (bwd_elems or 0) * BYTES))

    # stem: 224² x3 → 7×7/2 conv → 112² x64 → 3×3/2 maxpool → 56² x64
    f, out, inn = conv_cost(224, 224, 7, 3, 64, 2)
    add("stem conv", f, 224 * 224 * 3 / 2 + out * 2,
        f, inn + out)  # bwd: dW only (dX unneeded); reads act + dOut
    add("stem maxpool", 112 * 112 * 64 * 9, 56 * 56 * 64 * 2,
        0, 56 * 56 * 64 + 112 * 112 * 64)  # bwd: read dOut, scatter dIn

    # stages: [2,2,2,2] blocks, channels 64→512, spatial 56→7
    spec = [(56, 64, 64), (28, 64, 128), (14, 128, 256), (7, 256, 512)]
    for i, (hw, cin, cout) in enumerate(spec, 1):
        stage_f = stage_t = stage_bf = stage_bt = 0
        stride = 1 if i == 1 else 2
        in_hw = hw * stride

        def conv(h, w, k, ci, co, s=1):
            nonlocal stage_f, stage_t, stage_bf, stage_bt
            f, out, inn = conv_cost(h, w, k, ci, co, s)
            stage_f += f
            stage_t += out * 2
            stage_bf += 2 * f           # dX + dW
            stage_bt += 2 * inn + out   # re-read act, read dOut, write dIn

        conv(in_hw, in_hw, 3, cin, cout, stride)   # block 1 (may downsample)
        conv(hw, hw, 3, cout, cout)
        if stride != 1 or cin != cout:
            conv(in_hw, in_hw, 1, cin, cout, stride)
        for _ in range(2):                         # block 2
            conv(hw, hw, 3, cout, cout)
        # SE pool re-reads the stage activation once (fwd and bwd)
        stage_t += hw * hw * cout
        stage_bt += hw * hw * cout
        add(f"stage{i}", stage_f, stage_t, stage_bf, stage_bt)

    # text encoder + fusion + head: tiny (L=20, d=256)
    d, L, ffn, layers = 256, 20, 1024, 4
    text_f = layers * (4 * 2 * L * d * d + 2 * 2 * L * L * d +
                       2 * 2 * L * d * ffn)
    add("text encoder", text_f, layers * L * d * 6,
        2 * text_f, layers * L * d * 12)
    # per cross-attn layer: Q and O project the L text tokens, K and V
    # project the 49 image tokens
    fusion_f = 2 * (2 * 2 * L * d * d + 2 * 2 * 49 * d * d +
                    2 * 2 * L * 49 * d +
                    2 * 2 * L * d * 4 * d) + 2 * 49 * 512 * d
    add("fusion", fusion_f, 49 * d * 4 + L * d * 8,
        2 * fusion_f, 49 * d * 8 + L * d * 16)
    head_f = 2 * (d * 512 + 512 * d + d * 1000)
    add("answer head", head_f, 3000, 2 * head_f, 6000)

    if args.train:
        # parameter-side traffic per step, amortized per pair:
        # grads f32 write+read (2·P·4) + AdamW p/m/v read+write (6·P·4)
        param_bytes = 8 * N_PARAMS * 4 / args.batch
        add("grads+AdamW", 0, 0, 20 * N_PARAMS / args.batch,
            param_bytes / BYTES)

    peak = args.peak_tflops * 1e12
    bw = args.hbm_gbps * 1e9
    mode = "TRAIN STEP" if args.train else "INFERENCE FORWARD"
    print(f"== {mode} (per pair, batch={args.batch}) ==")
    hdr_b = "" if not args.train else f"{'bwd GF':>9}{'bwd MB':>9}"
    print(f"{'component':<14}{'GFLOP':>9}{'MB':>8}{hdr_b}"
          f"{'t_mxu µs':>10}{'t_hbm µs':>10}{'bound':>8}")
    total_f = total_b = 0
    for name, f, b, bf, bb in rows:
        if args.train:
            fo, bo = f + bf, b + bb
        else:
            fo, bo = f, b
        total_f += fo
        total_b += bo
        tc, tm = fo / peak * 1e6, bo / bw * 1e6
        ext = f"{bf/1e9:>9.2f}{bb/1e6:>9.2f}" if args.train else ""
        print(f"{name:<14}{f/1e9:>9.3f}{b/1e6:>8.2f}{ext}"
              f"{tc:>10.2f}{tm:>10.2f}{'mem' if tm > tc else 'mxu':>8}")
    tc, tm = total_f / peak * 1e6, total_b / bw * 1e6
    print("-" * (64 if not args.train else 82))
    print(f"{'TOTAL':<14}{total_f/1e9:>9.3f}{total_b/1e6:>8.2f}"
          f"{'':>{0 if not args.train else 18}}{tc:>10.2f}{tm:>10.2f}")
    print(f"\nadditive floor (no overlap): {tc+tm:.1f} µs/pair "
          f"→ {1e6/(tc+tm):,.0f} pairs/s")
    print(f"perfect-overlap floor:        {max(tc,tm):.1f} µs/pair "
          f"→ {1e6/max(tc,tm):,.0f} pairs/s")
    if args.measured_pairs_per_sec:
        t = 1e6 / args.measured_pairs_per_sec
        print(f"measured:                     {t:.1f} µs/pair "
              f"({args.measured_pairs_per_sec:,.0f} pairs/s, "
              f"{(tc+tm)/t*100:.0f}% of additive floor)")


if __name__ == "__main__":
    main()
