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


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
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

    results = {}
    for variant in args.variants.split(","):
        flags = VARIANTS[variant]
        ckpt_dir = f"checkpoints/ablation_{variant}"
        eval_dir = f"checkpoints/ablation_{variant}/heldout_eval"
        t0 = time.time()
        sh([sys.executable, "-m", "vqa_tpu.training.train",
            "--questions", f"{args.train_corpus}/questions.json",
            "--annotations", f"{args.train_corpus}/annotations.json",
            "--images-dir", f"{args.train_corpus}/images",
            "--subset-size", "999999",
            "--epochs", str(args.epochs),
            "--batch-size", str(args.batch_size),
            "--device-aug", "--seed", str(args.seed),
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
        with open(os.path.join(eval_dir, "evaluation_results.json")) as f:
            ev = json.load(f)
        results[variant] = {
            "train_wall_s": round(train_wall, 1),
            "heldout_top1": ev["top1_accuracy"],
            "heldout_top5": ev["top5_accuracy"],
            "vqa_soft_accuracy": ev.get("vqa_soft_accuracy"),
            "per_type_accuracy": ev.get("per_type_accuracy"),
            "num_samples": ev["num_samples"],
        }
        print(f"[ablation] {variant}: "
              f"{json.dumps(results[variant], indent=2)}", flush=True)

    payload = {
        "train_corpus": args.train_corpus,
        "val_corpus": args.val_corpus,
        "epochs": args.epochs,
        "batch_size": args.batch_size,
        "seed": args.seed,
        "variants": results,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
