"""Spatial-attention ablation study: full / no-spatial / no-attention.

Fills the reference README's blank ablation table (reference:
README.md:345-364) on a corpus where backbone spatial attention could
plausibly matter: 2x2-grid scenes with grid-localized questions ("what
color is the shape in the top left" / "what shape is in the bottom
right") that global average pooling cannot answer. Shapes are rendered
large and steady (``SPATIAL_DRAW`` in vqa_tpu/data/synthetic.py) so shape
IDENTITY survives the backbone's 32x downsampling — at the old rendering
"what shape where" sat at the 33.3% chance floor for every variant,
carrying no ablation signal.

For each variant the script:
  1. trains via the real train CLI on ``data/vqa_synth_spatial``,
  2. evaluates via the real evaluate CLI on the HELD-OUT
     ``data/vqa_synth_spatial_val`` corpus (different seed - unseen
     scenes), with the per-question-type breakdown,
and writes the combined table to docs/ABLATION.json. Corpora are
generated on first use (make_vqa_corpus.py --spatial, seeds 42 / 4242).

Run (on the TPU host):
    python scripts/run_ablation.py --epochs 16

Multi-seed (VERDICT r4 weak #5 — the single-seed "no_spatial is
best-or-tied" conclusion needed error bars): pass --seeds 42,7,11; the
script reuses any (variant, seed) already in --out (idempotent resume),
runs only the missing cells, and writes per-seed results plus mean ±
95% CI (Student-t, small n) per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "full": [],
    "no_spatial": ["--no-spatial"],
    "no_attention": ["--no-attention"],
}


def sh(cmd, log_path):
    print(f"[ablation] $ {' '.join(cmd)}", flush=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    with open(log_path, "ab") as log:
        rc = subprocess.call(cmd, cwd=REPO, env=env, stdout=log, stderr=log)
    if rc != 0:
        raise SystemExit(f"command failed rc={rc}: {' '.join(cmd)} "
                         f"(log: {log_path})")


def ensure_corpus(out_dir, num_images, seed, log):
    if os.path.exists(os.path.join(out_dir, "questions.json")):
        print(f"[ablation] corpus {out_dir} exists", flush=True)
        return
    sh([sys.executable, "scripts/make_vqa_corpus.py", "--out", out_dir,
        "--num-images", str(num_images), "--seed", str(seed), "--spatial"],
       log)


def mean_ci95(values):
    """Mean and 95% CI half-width (Student-t for the small n here)."""
    n = len(values)
    m = sum(values) / n
    if n < 2:
        return m, 0.0
    var = sum((v - m) ** 2 for v in values) / (n - 1)
    # two-sided 97.5% t quantiles (n-1 df); the z fallback 1.96 would
    # understate the half-width by ~15% already at df=8, so carry the
    # table far past any plausible seed count and stay slightly
    # conservative beyond it (t_inf = 1.960)
    t = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571,
         6: 2.447, 7: 2.365, 8: 2.306, 9: 2.262, 10: 2.228,
         11: 2.201, 12: 2.179, 13: 2.160, 14: 2.145, 15: 2.131,
         16: 2.120, 17: 2.110, 18: 2.101, 19: 2.093, 20: 2.086,
         }.get(n - 1, 2.06 if n - 1 <= 30 else 2.00)
    return m, t * (var ** 0.5) / (n ** 0.5)


def _load_existing(path):
    """Existing per-seed cells from --out, migrating the old single-seed
    schema ({"seed": 42, "variants": {v: {...metrics}}}) in place."""
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        old = json.load(f)
    cells = {}
    seed = old.get("seed")
    for v, payload in old.get("variants", {}).items():
        if "per_seed" in payload:
            for s, metrics in payload["per_seed"].items():
                cells[(v, int(s))] = metrics
        elif seed is not None:
            cells[(v, int(seed))] = payload
    return cells


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--seeds", default="42",
                   help="comma-separated training seeds; (variant, seed) "
                        "cells already in --out are reused, not rerun")
    p.add_argument("--train-corpus", default="data/vqa_synth_spatial")
    p.add_argument("--val-corpus", default="data/vqa_synth_spatial_val")
    p.add_argument("--num-images", type=int, default=2500)
    p.add_argument("--val-num-images", type=int, default=500)
    p.add_argument("--variants", default="full,no_spatial,no_attention")
    p.add_argument("--out", default="docs/ABLATION.json")
    p.add_argument("--log", default="/tmp/ablation.log")
    args = p.parse_args(argv)

    ensure_corpus(args.train_corpus, args.num_images, 42, args.log)
    ensure_corpus(args.val_corpus, args.val_num_images, 4242, args.log)

    seeds = [int(s) for s in args.seeds.split(",")]
    cells = _load_existing(args.out)

    def write_out():
        # every variant with cells, NOT just --variants: a partial rerun
        # must never drop another variant's committed results from the
        # artifact (round 5 briefly lost the no_attention column this way)
        variants = {}
        for v in sorted({vv for (vv, _) in cells}):
            per_seed = {str(s): cells[(v, s)] for s in sorted(
                {s for (vv, s) in cells if vv == v})}
            if not per_seed:
                continue
            top1 = [m["heldout_top1"] for m in per_seed.values()]
            m, ci = mean_ci95(top1)
            variants[v] = {
                "per_seed": per_seed,
                "n_seeds": len(per_seed),
                "mean_heldout_top1": round(m, 4),
                "ci95_heldout_top1": round(ci, 4),
            }
        payload = {
            "train_corpus": args.train_corpus,
            "val_corpus": args.val_corpus,
            "epochs": args.epochs,
            "batch_size": args.batch_size,
            "seeds": sorted({s for (_, s) in cells}),
            "variants": variants,
        }
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        return payload

    for variant in args.variants.split(","):
        flags = VARIANTS[variant]
        for seed in seeds:
            if (variant, seed) in cells:
                print(f"[ablation] {variant} seed {seed}: cached in "
                      f"{args.out}", flush=True)
                continue
            ckpt_dir = f"checkpoints/ablation_{variant}_s{seed}"
            eval_dir = f"{ckpt_dir}/heldout_eval"
            t0 = time.time()
            sh([sys.executable, "-m", "vqa_tpu.training.train",
                "--questions", f"{args.train_corpus}/questions.json",
                "--annotations", f"{args.train_corpus}/annotations.json",
                "--images-dir", f"{args.train_corpus}/images",
                "--subset-size", "999999",
                "--epochs", str(args.epochs),
                "--batch-size", str(args.batch_size),
                "--device-aug", "--seed", str(seed),
                "--checkpoint-dir", ckpt_dir, *flags], args.log)
            train_wall = time.time() - t0
            sh([sys.executable, "-m", "vqa_tpu.training.evaluate",
                "--checkpoint-dir", ckpt_dir,
                "--questions", f"{args.val_corpus}/questions.json",
                "--annotations", f"{args.val_corpus}/annotations.json",
                "--images-dir", f"{args.val_corpus}/images",
                "--batch-size", str(args.batch_size),
                "--max-samples", "999999",
                "--output-dir", eval_dir], args.log)
            with open(os.path.join(eval_dir,
                                   "evaluation_results.json")) as f:
                ev = json.load(f)
            cells[(variant, seed)] = {
                "train_wall_s": round(train_wall, 1),
                "heldout_top1": ev["top1_accuracy"],
                "heldout_top5": ev["top5_accuracy"],
                "vqa_soft_accuracy": ev.get("vqa_soft_accuracy"),
                "per_type_accuracy": ev.get("per_type_accuracy"),
                "num_samples": ev["num_samples"],
            }
            write_out()  # checkpoint the artifact after every cell
            print(f"[ablation] {variant} seed {seed}: "
                  f"{json.dumps(cells[(variant, seed)], indent=2)}",
                  flush=True)

    print(json.dumps(write_out(), indent=2))


if __name__ == "__main__":
    main()
