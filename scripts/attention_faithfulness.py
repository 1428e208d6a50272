"""Measure cross-attention faithfulness on held-out spatial scenes.

The round-3 ablation concluded that localization lives in the
cross-attention fusion (docs/ARCHITECTURE.md), and the serving layer
exposes the maps via ``/attention`` — but neither was ever validated
beyond shape checks. This script quantifies the claim: for every held-out
spatially-grounded question ("what color is the shape in the top left" /
"what shape is in the bottom right") it computes the fraction of the
question's cross-attention mass that lands in the QUERIED image quadrant
(vqa_tpu.utils.attention_analysis). Uniform attention scores 0.25; a
model that looks where the question points scores higher.

Run after scripts/run_ablation.py has trained checkpoints/ablation_full:

    python scripts/attention_faithfulness.py \
        --checkpoint-dir checkpoints/ablation_full \
        --corpus data/vqa_synth_spatial_val

Writes docs/ATTENTION_FAITHFULNESS.json (per-position and per-type
distributions) for the docs/ARCHITECTURE.md subsection; the companion
unit/integration tests live in tests/test_attention_analysis.py.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint-dir", default="checkpoints/ablation_full")
    p.add_argument("--checkpoint", default="best_model")
    p.add_argument("--corpus", default="data/vqa_synth_spatial_val")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--out", default="docs/ATTENTION_FAITHFULNESS.json")
    args = p.parse_args(argv)

    import jax

    from vqa_tpu.data.dataset import BatchLoader, VQADataset
    from vqa_tpu.models.fusion import attention_visualization
    from vqa_tpu.training.checkpoint import load_model_for_inference
    from vqa_tpu.utils.attention_analysis import (
        QUADRANT_NAMES,
        position_from_question,
        quadrant_masses,
    )
    from vqa_tpu.utils.cache import enable_compilation_cache
    from vqa_tpu.utils.tokenizer import Tokenizer
    from vqa_tpu.data.vocab import AnswerVocabulary

    enable_compilation_cache()
    model, variables = load_model_for_inference(
        args.checkpoint_dir, args.checkpoint
    )
    tokenizer = Tokenizer()
    tokenizer.load(os.path.join(args.checkpoint_dir, "tokenizer.json"))
    vocab = AnswerVocabulary()
    vocab.load(os.path.join(args.checkpoint_dir, "answer_vocab.json"))

    ds = VQADataset(
        os.path.join(args.corpus, "questions.json"),
        os.path.join(args.corpus, "annotations.json"),
        os.path.join(args.corpus, "images"),
        tokenizer=tokenizer, answer_vocab=vocab,
        is_training=False, image_size=model.config.image_size,
    )
    # held-out samples whose question names a quadrant
    picked = [
        (i, position_from_question(s["question"]), s["question_type"])
        for i, s in enumerate(ds.samples)
    ]
    picked = [t for t in picked if t[1] is not None]
    if not picked:
        raise SystemExit(f"no spatial questions in {args.corpus}")
    indices = [i for i, _, _ in picked]
    loader = BatchLoader(ds, args.batch_size, shuffle=False,
                         drop_last=False, indices=indices)

    side = model.config.feature_spatial_size

    @jax.jit
    def spatial_maps(images, token_ids, attention_mask):
        logits, aux = model.apply(
            variables, images, token_ids, attention_mask,
            train=False, return_aux=True,
        )
        maps = attention_visualization(
            aux["cross_attention_weights"], side
        )
        return logits.argmax(-1), maps

    masses, preds = [], []
    for batch in loader:
        top1, maps = spatial_maps(
            batch["image"], batch["token_ids"], batch["attention_mask"]
        )
        valid = int(batch.get("valid", len(batch["image"])))
        qm = quadrant_masses(
            np.asarray(maps), np.asarray(batch["attention_mask"])
        )
        masses.append(qm[:valid])
        preds.append(np.asarray(top1)[:valid])
    masses = np.concatenate(masses)          # [N, 4]
    preds = np.concatenate(preds)

    queried = np.array([q for _, q, _ in picked])
    qtypes = [t for _, _, t in picked]
    # VQADataset samples store the already-encoded answer index
    targets = np.array([ds.samples[i]["answer"] for i in indices])
    mass_at_queried = masses[np.arange(len(picked)), queried]

    def stats(x):
        x = np.asarray(x, np.float64)
        return {
            "n": int(x.size),
            "mean": round(float(x.mean()), 4),
            "median": round(float(np.median(x)), 4),
            "p10": round(float(np.percentile(x, 10)), 4),
            "p90": round(float(np.percentile(x, 90)), 4),
            "frac_above_uniform": round(float((x > 0.25).mean()), 4),
        }

    by_position = {
        name: stats(mass_at_queried[queried == i])
        for i, name in enumerate(QUADRANT_NAMES)
        if (queried == i).any()
    }
    by_type = {
        t: stats(mass_at_queried[[qt == t for qt in qtypes]])
        for t in sorted(set(qtypes))
    }
    correct = preds == targets
    payload = {
        "checkpoint_dir": args.checkpoint_dir,
        "corpus": args.corpus,
        "uniform_baseline": 0.25,
        "overall": stats(mass_at_queried),
        "by_position": by_position,
        "by_question_type": by_type,
        "on_correct_answers": stats(mass_at_queried[correct])
        if correct.any() else None,
        "on_wrong_answers": stats(mass_at_queried[~correct])
        if (~correct).any() else None,
        "top1_on_spatial_questions": round(float(correct.mean()), 4),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
