"""Targeted headroom experiments (VERDICT r1 item 3): turn the two profiled
cost hypotheses from docs/PERF.md into accept/reject measurements.

1. SE-pool second activation read: the SE global-average-pools showed up as
   ~12% of device time (convert_reduce_fusion). Hypothesis: that cost is the
   unavoidable HBM re-read of each stage's activation. Measurement: b=1024
   inference with SE on vs off, delta compared against the predicted
   read-bytes/bandwidth cost.

2. Stage-1 lane underfill: stage-1 convs have C=64 < the 128-wide vector
   lanes. Hypothesis: stage-1 MXU utilization is ~half, so widening stage 1
   to 128 channels (~2.4x the stage-1/stem FLOPs) should cost far less than
   proportional time. Measurement: time and compiler FLOPs for
   stage_channels (64,...) vs (128,...).

Run on the TPU:  python scripts/exp_headroom.py
Prints one human-readable table + verdicts; results recorded in docs/PERF.md.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _chip_peak_flops, _compiled_flops
from vqa_tpu.data.preprocess import device_normalize
from vqa_tpu.models import create_vqa_model, init_vqa_model
from vqa_tpu.utils.cache import enable_compilation_cache

B = 1024
CHAIN = 10
REPS = 3
HBM_GBPS = 819e9  # v5e HBM bandwidth


def measure(tag, **model_kwargs):
    model = create_vqa_model(dtype=jnp.bfloat16, **model_kwargs)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))

    @jax.jit
    def infer(variables, pixels_u8, token_ids, attention_mask):
        images = device_normalize(pixels_u8).astype(jnp.bfloat16)
        logits, _ = model.apply(
            variables, images, token_ids, attention_mask, train=False
        )
        return logits

    rng = np.random.default_rng(0)
    inputs = []
    for _ in range(2):
        inputs.append((
            jnp.asarray(rng.integers(0, 256, size=(B, 224, 224, 3),
                                     dtype=np.uint8)),
            jnp.asarray(rng.integers(4, 10000, size=(B, 20)), jnp.int32),
            jnp.ones((B, 20), jnp.int32),
        ))
    for i in range(3):
        jax.block_until_ready(infer(variables, *inputs[i % 2]))
    flops = _compiled_flops(infer, variables, *inputs[0])

    best_dt = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = None
        for i in range(CHAIN):
            out = infer(variables, *inputs[i % 2])
        jax.block_until_ready(out)
        _ = float(out[0, 0])
        best_dt = min(best_dt, (time.perf_counter() - t0) / CHAIN)
    us_per_pair = best_dt / B * 1e6
    print(f"{tag:28s} step {best_dt*1e3:7.2f} ms  {us_per_pair:6.2f} us/pair"
          f"  flops/pair {flops/B/1e9 if flops else float('nan'):6.2f} G")
    return best_dt, flops


def main():
    enable_compilation_cache()
    peak, gen = _chip_peak_flops("bfloat16")
    if peak is None:
        sys.exit(f"unrecognized chip {gen!r} — this experiment needs a "
                 "known-TPU peak to compute MFU")
    print(f"chip: {gen}, peak {peak/1e12:.0f} TFLOP/s, b={B}\n")

    base_dt, base_flops = measure("base (full model)")
    nose_dt, nose_flops = measure("no SE", use_se_attention=False)
    wide_dt, wide_flops = measure(
        "stage1 widened to 128ch", stage_channels=(128, 128, 256, 512)
    )
    if not all((base_flops, nose_flops, wide_flops)):
        sys.exit("backend reports no cost_analysis flops — cannot compute "
                 "the accept/reject numbers")

    # ---- Experiment 1: SE pool = activation re-read? -------------------
    # bf16 stage-output activations re-read by the 4 SE pools, per pair:
    # 56^2*64 + 28^2*128 + 14^2*256 + 7^2*512 elements * 2 bytes
    se_bytes = (56**2 * 64 + 28**2 * 128 + 14**2 * 256 + 7**2 * 512) * 2
    predicted_us = se_bytes / HBM_GBPS * 1e6
    measured_us = (base_dt - nose_dt) / B * 1e6
    print(f"\n[SE pool] measured delta {measured_us:.2f} us/pair vs "
          f"pure-re-read prediction {predicted_us:.2f} us/pair "
          f"(x{measured_us/predicted_us:.1f})")
    print("  -> ACCEPT 'HBM-bound, not MXU' if the delta is bandwidth-scale "
          "(single-digit us) and far above the SE FLOP cost; "
          f"SE flops/pair: {(base_flops - nose_flops)/B/1e6:.1f} MFLOP = "
          f"{(base_flops - nose_flops)/B/peak*1e6:.3f} us at peak")

    # ---- Experiment 2: stage-1 lane underfill ---------------------------
    dflops = (wide_flops - base_flops) / B
    dtime_us = (wide_dt - base_dt) / B * 1e6
    at_peak_us = dflops / peak * 1e6
    print(f"\n[stage1 underfill] widening adds {dflops/1e9:.2f} GFLOP/pair; "
          f"measured +{dtime_us:.2f} us/pair vs {at_peak_us:.2f} us/pair "
          f"if the extra FLOPs ran at peak")
    print("  -> ACCEPT underfill if measured extra time << extra FLOPs at "
          "the base path's efficiency (i.e. the widened convs run much "
          "closer to peak): base path MFU "
          f"{base_flops/B/(base_dt/B)/peak:.3f}, widened-delta MFU "
          f"{dflops/(dtime_us/1e6)/peak if dtime_us > 0 else float('inf'):.3f}")


if __name__ == "__main__":
    main()
    import os
    sys.stdout.flush()
    os._exit(0)
