"""Roofline accounting for the VQA forward: per-stage FLOPs and HBM
activation traffic → compute-bound vs bandwidth-bound time floors.

Explains the measured end-to-end inference number (bench.py) from first
principles: the step time is approximately compute_time + activation
traffic time (XLA does not fuse across conv boundaries, so every conv
output round-trips HBM once at batch sizes past the cache).

Usage: python scripts/roofline.py [--batch 1024] [--peak-tflops 197]
       [--hbm-gbps 819] [--measured-pairs-per-sec N]
"""

from __future__ import annotations

import argparse


def conv_cost(h, w, k, cin, cout, stride=1):
    """(flops, out_elems) for one conv layer at [h,w,cin] input."""
    oh, ow = h // stride, w // stride
    return 2 * oh * ow * k * k * cin * cout, oh * ow * cout


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="bf16 dense peak (v5e)")
    p.add_argument("--hbm-gbps", type=float, default=819.0, help="v5e HBM BW")
    p.add_argument("--measured-pairs-per-sec", type=float, default=None)
    args = p.parse_args()

    BYTES = 2  # bf16 activations
    rows = []

    def add(name, flops, traffic_elems):
        rows.append((name, flops, traffic_elems * BYTES))

    # stem: 224² x3 → 7×7/2 conv → 112² x64 → 3×3/2 maxpool → 56² x64
    f, out = conv_cost(224, 224, 7, 3, 64, 2)
    add("stem conv", f, 224 * 224 * 3 / 2 + out * 2)  # in (u8≈.5 elem) + out w+r
    add("stem maxpool", 112 * 112 * 64 * 9, 56 * 56 * 64 * 2)

    # stages: [2,2,2,2] blocks, channels 64→512, spatial 56→7
    spec = [(56, 64, 64), (28, 64, 128), (14, 128, 256), (7, 256, 512)]
    for i, (hw, cin, cout) in enumerate(spec, 1):
        stage_f = stage_t = 0
        stride = 1 if i == 1 else 2
        in_hw = hw * stride
        # block 1 (may downsample)
        f, out = conv_cost(in_hw, in_hw, 3, cin, cout, stride)
        stage_f += f; stage_t += out * 2
        f, out = conv_cost(hw, hw, 3, cout, cout)
        stage_f += f; stage_t += out * 2
        if stride != 1 or cin != cout:
            f, out = conv_cost(in_hw, in_hw, 1, cin, cout, stride)
            stage_f += f; stage_t += out * 2
        # block 2
        for _ in range(2):
            f, out = conv_cost(hw, hw, 3, cout, cout)
            stage_f += f; stage_t += out * 2
        # SE pool re-reads the stage activation once
        stage_t += hw * hw * cout
        add(f"stage{i}", stage_f, stage_t)

    # text encoder + fusion + head: tiny (L=20, d=256)
    d, L, ffn, layers = 256, 20, 1024, 4
    text_f = layers * (4 * 2 * L * d * d + 2 * 2 * L * L * d +
                       2 * 2 * L * d * ffn)
    add("text encoder", text_f, layers * L * d * 6)
    # per cross-attn layer: Q and O project the L text tokens, K and V
    # project the 49 image tokens
    fusion_f = 2 * (2 * 2 * L * d * d + 2 * 2 * 49 * d * d +
                    2 * 2 * L * 49 * d +
                    2 * 2 * L * d * 4 * d) + 2 * 49 * 512 * d
    add("fusion", fusion_f, 49 * d * 4 + L * d * 8)
    add("answer head", 2 * (d * 512 + 512 * d + d * 1000), 3000)

    total_f = sum(r[1] for r in rows)
    total_b = sum(r[2] for r in rows)
    peak = args.peak_tflops * 1e12
    bw = args.hbm_gbps * 1e9

    print(f"{'component':<14}{'GFLOP/pair':>12}{'MB/pair':>10}"
          f"{'t_mxu µs':>10}{'t_hbm µs':>10}{'bound':>8}")
    for name, f, b in rows:
        tc, tm = f / peak * 1e6, b / bw * 1e6
        print(f"{name:<14}{f/1e9:>12.3f}{b/1e6:>10.2f}"
              f"{tc:>10.2f}{tm:>10.2f}{'mem' if tm > tc else 'mxu':>8}")
    tc, tm = total_f / peak * 1e6, total_b / bw * 1e6
    print("-" * 64)
    print(f"{'TOTAL':<14}{total_f/1e9:>12.3f}{total_b/1e6:>10.2f}"
          f"{tc:>10.2f}{tm:>10.2f}")
    print(f"\nadditive floor (no overlap): {tc+tm:.1f} µs/pair "
          f"→ {1e6/(tc+tm):,.0f} pairs/s")
    print(f"perfect-overlap floor:        {max(tc,tm):.1f} µs/pair "
          f"→ {1e6/max(tc,tm):,.0f} pairs/s")
    if args.measured_pairs_per_sec:
        t = 1e6 / args.measured_pairs_per_sec
        print(f"measured:                     {t:.1f} µs/pair "
              f"({args.measured_pairs_per_sec:,.0f} pairs/s)")


if __name__ == "__main__":
    main()
