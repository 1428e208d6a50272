"""Head-to-head training parity: this framework vs the reference trainer.

Trains the REFERENCE PyTorch stack (/root/reference, CPU, via the minimal
torchvision shim in scripts/ref_compat) and this repo's TPU-native stack on
the SAME corpus, SAME split, SAME tokenizer/answer-vocab artifacts, and
matched hyperparameters (aug off, warmup 0, f32, AdamW lr/wd/clip/cosine —
reference: training/train.py:120-143), then:

1. overlays per-epoch train-loss / val-top-1 curves,
2. imports the reference's resulting best_model.pth into this framework
   (vqa_tpu.compat.torch_import) and re-evaluates it here, checking the
   reference-trained weights score the same under our evaluator.

Writes docs/HEAD_TO_HEAD.md + head_to_head.json. Run:

    python scripts/head_to_head.py --corpus data/vqa_synth \
        --subset 1200 --epochs 8
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_shared_artifacts(corpus: str, subset: int, max_len: int, tmp: str):
    """Tokenizer + answer vocab built once (our code), saved as the
    reference-compatible JSON artifacts both sides load."""
    from vqa_tpu.data.vocab import AnswerVocabulary
    from vqa_tpu.utils.tokenizer import create_tokenizer_from_questions

    with open(os.path.join(corpus, "questions.json")) as f:
        questions = json.load(f)["questions"][:subset]
    with open(os.path.join(corpus, "annotations.json")) as f:
        annotations = json.load(f)["annotations"]
    ann_by_qid = {a["question_id"]: a for a in annotations}
    tokenizer = create_tokenizer_from_questions(
        [q["question"] for q in questions], max_length=max_len,
        vocab_size=10000,
    )
    vocab = AnswerVocabulary(num_answers=1000)
    vocab.build_from_qa_pairs(
        [
            {"answer": ann_by_qid[q["question_id"]]["multiple_choice_answer"]}
            for q in questions
            if q["question_id"] in ann_by_qid
        ]
    )
    tok_path = os.path.join(tmp, "tokenizer.json")
    vocab_path = os.path.join(tmp, "answer_vocab.json")
    tokenizer.save(tok_path)
    vocab.save(vocab_path)
    return tok_path, vocab_path, tokenizer, vocab


def split_indices(n: int, seed: int):
    idx = np.random.default_rng(seed).permutation(n)
    n_train = int(n * 0.8)
    return idx[:n_train], idx[n_train:]


# ---------------------------------------------------------------------------
def run_reference(corpus, subset, epochs, batch_size, lr, wd, seed,
                  tok_path, vocab_path, max_len, ckpt_dir,
                  dropout=None, answer_dropout=None, init_dump=None):
    """Train the reference stack on CPU; returns (history, final_val).

    ``dropout``/``answer_dropout`` override the model's regularization (0.0
    disables it — the controlled-offset experiment); ``init_dump`` saves the
    UNTRAINED epoch-0 state_dict to that path so our side can start from
    identical weights via vqa_tpu.compat.torch_import."""
    sys.path.insert(0, os.path.join(REPO, "scripts", "ref_compat"))
    sys.path.insert(0, "/root/reference")

    # Sandbox the reference's path side effects: utils/config.py's
    # PathConfig auto-mkdirs its hardcoded Windows-style "d:/cnn/..." paths
    # into the CWD on import AND on every instantiation
    # (/root/reference/utils/config.py:18-54). Intercept os.makedirs for
    # those paths for the lifetime of the run — our own code never uses a
    # "d:"-prefixed relative path, so this is a no-op outside the shim.
    real_makedirs = os.makedirs
    if not getattr(os.makedirs, "_ref_sandboxed", False):
        def _sandboxed_makedirs(path, *a, **k):
            p = str(path).replace("\\", "/")
            if p.startswith("d:") or "/d:/" in p:
                return None  # reference PathConfig's hardcoded paths
            return real_makedirs(path, *a, **k)

        _sandboxed_makedirs._ref_sandboxed = True
        os.makedirs = _sandboxed_makedirs

    import torch
    from torch.utils.data import DataLoader

    torch.manual_seed(seed)
    import random as _random

    _random.seed(seed)
    np.random.seed(seed)

    from data.build_vocab import AnswerVocabulary as RefVocab
    from data.dataset import VQADataset as RefDataset
    from data.preprocess import get_val_transforms, vqa_collate_fn
    from models.vqa_model import create_vqa_model as ref_create
    from training.train import Trainer as RefTrainer
    from utils.tokenizer import Tokenizer as RefTokenizer

    tok = RefTokenizer()
    tok.load(tok_path)
    vocab = RefVocab()
    vocab.load(vocab_path)

    # aug OFF on both sides: deterministic resize-224 transform for train
    # AND val (reference default train transform jitters/crops)
    ds = RefDataset(
        os.path.join(corpus, "images"),
        os.path.join(corpus, "questions.json"),
        os.path.join(corpus, "annotations.json"),
        tokenizer=tok, answer_vocab=vocab,
        transform=get_val_transforms(224),
        max_samples=subset, is_training=False,
    )
    train_idx, val_idx = split_indices(len(ds.samples), seed)
    import copy

    train_ds, val_ds = copy.copy(ds), copy.copy(ds)
    train_ds.samples = [ds.samples[i] for i in train_idx]
    val_ds.samples = [ds.samples[i] for i in val_idx]
    g = torch.Generator()
    g.manual_seed(seed)
    train_loader = DataLoader(
        train_ds, batch_size=batch_size, shuffle=True, drop_last=True,
        collate_fn=vqa_collate_fn, generator=g,
    )
    val_loader = DataLoader(
        val_ds, batch_size=batch_size, shuffle=False,
        collate_fn=vqa_collate_fn,
    )
    overrides = {}
    if dropout is not None:
        overrides["dropout"] = dropout
    if answer_dropout is not None:
        overrides["answer_dropout"] = answer_dropout
    model = ref_create(vocab_size=tok.vocab_size, **overrides)
    if init_dump is not None:
        torch.save({"model_state_dict": model.state_dict()}, init_dump)
    trainer = RefTrainer(
        model, train_loader, val_loader, device="cpu",
        learning_rate=lr, weight_decay=wd, num_epochs=epochs,
        use_amp=False, checkpoint_dir=ckpt_dir,
    )
    t0 = time.time()
    history = trainer.train(patience=epochs + 1)
    wall = time.time() - t0
    n_train, n_val = len(train_ds.samples), len(val_ds.samples)
    return history, wall, n_train, n_val


# ---------------------------------------------------------------------------
def run_ours(corpus, subset, epochs, batch_size, lr, wd, seed,
             tokenizer, vocab, max_len, ckpt_dir,
             dropout=None, answer_dropout=None, lr_schedule="step",
             init_pth=None):
    """Train this framework with matched hparams; returns history.

    Controlled-experiment knobs: ``dropout``/``answer_dropout`` overrides,
    ``lr_schedule='epoch'`` for the reference's per-epoch CosineAnnealingLR
    stepping, ``init_pth`` = a reference state_dict .pth to start from
    (identical-init comparison)."""
    import jax

    from vqa_tpu.data.dataset import BatchLoader, VQADataset
    from vqa_tpu.models import create_vqa_model, init_vqa_model
    from vqa_tpu.training.train import Trainer
    from vqa_tpu.utils.config import ModelConfig, TrainingConfig

    ds_train = VQADataset(
        os.path.join(corpus, "questions.json"),
        os.path.join(corpus, "annotations.json"),
        os.path.join(corpus, "images"),
        tokenizer=tokenizer, answer_vocab=vocab,
        max_question_length=max_len, max_samples=subset,
        is_training=False,  # aug OFF to match the reference run
        image_size=224,
    )
    train_idx, val_idx = split_indices(len(ds_train.samples), seed)
    train_loader = BatchLoader(
        ds_train, batch_size, shuffle=True, drop_last=True, seed=seed,
        indices=train_idx,
    )
    val_loader = BatchLoader(
        ds_train, batch_size, shuffle=False, drop_last=False,
        indices=val_idx,
    )
    mkw = {}
    if dropout is not None:
        mkw["dropout"] = dropout
    if answer_dropout is not None:
        mkw["answer_dropout"] = answer_dropout
    mcfg = ModelConfig(vocab_size=tokenizer.vocab_size, **mkw)
    model = create_vqa_model(config=mcfg, dtype=None)  # f32 end to end
    if init_pth is not None:
        import torch

        from vqa_tpu.compat.torch_import import convert_torch_state_dict

        sd = torch.load(init_pth, map_location="cpu", weights_only=False)
        variables = convert_torch_state_dict(sd["model_state_dict"])
    else:
        variables = init_vqa_model(model, jax.random.PRNGKey(seed))
    tcfg = TrainingConfig(
        batch_size=batch_size, learning_rate=lr, weight_decay=wd,
        num_epochs=epochs, warmup_epochs=0, min_lr=1e-6, use_bf16=False,
        seed=seed, lr_schedule_granularity=lr_schedule,
    )
    trainer = Trainer(
        model, variables, train_loader, val_loader, config=tcfg,
        checkpoint_dir=ckpt_dir, seed=seed,
    )
    t0 = time.time()
    logger = trainer.train(patience=epochs + 1)
    wall = time.time() - t0
    return logger.to_dict(), wall


def import_and_eval_reference_ckpt(ref_ckpt, corpus, subset, batch_size,
                                   tokenizer, vocab, max_len, seed, tmp):
    """Import the reference-trained .pth into this framework and evaluate
    it on the same val split with OUR evaluator."""
    from vqa_tpu.compat.torch_import import import_checkpoint_to_dir
    from vqa_tpu.data.dataset import BatchLoader, VQADataset
    from vqa_tpu.training.checkpoint import load_model_for_inference
    from vqa_tpu.training.evaluate import Evaluator

    out_dir = os.path.join(tmp, "imported")
    import_checkpoint_to_dir(ref_ckpt, out_dir)
    model, variables = load_model_for_inference(out_dir, "latest")
    ds = VQADataset(
        os.path.join(corpus, "questions.json"),
        os.path.join(corpus, "annotations.json"),
        os.path.join(corpus, "images"),
        tokenizer=tokenizer, answer_vocab=vocab,
        max_question_length=max_len, max_samples=subset,
        is_training=False, image_size=224,
    )
    _, val_idx = split_indices(len(ds.samples), seed)
    loader = BatchLoader(ds, batch_size, shuffle=False, drop_last=False,
                         indices=val_idx)
    ev = Evaluator(model, variables, vocab)
    return ev.evaluate(loader)


# ---------------------------------------------------------------------------
def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--corpus", default="data/vqa_synth")
    p.add_argument("--subset", type=int, default=1200)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max-question-length", type=int, default=20)
    p.add_argument("--out", default="docs")
    p.add_argument("--skip-reference", action="store_true",
                   help="reuse a previous reference history JSON")
    p.add_argument("--dropout", type=float, default=None,
                   help="override transformer/CNN dropout on BOTH sides "
                        "(0.0 = controlled-offset experiment)")
    p.add_argument("--answer-dropout", type=float, default=None,
                   help="override answer-head dropout on BOTH sides")
    p.add_argument("--lr-schedule", choices=("step", "epoch"),
                   default="step",
                   help="our cosine granularity; 'epoch' matches the "
                        "reference's per-epoch CosineAnnealingLR stepping")
    p.add_argument("--init-from-ref", action="store_true",
                   help="start our trainer from the reference model's "
                        "epoch-0 weights (identical-init comparison)")
    p.add_argument("--tag", default="",
                   help="suffix for output artifacts; a tagged run writes "
                        "docs/h2h_{tag}.json and does NOT overwrite "
                        "HEAD_TO_HEAD.md (controlled experiments)")
    args = p.parse_args(argv)

    tmp = tempfile.mkdtemp(prefix="h2h_")
    tok_path, vocab_path, tokenizer, vocab = build_shared_artifacts(
        args.corpus, args.subset, args.max_question_length, tmp
    )

    ref_ckpt_dir = os.path.join(tmp, "ref_ckpt")
    suffix = f"_{args.tag}" if args.tag else ""
    ref_state = os.path.join(args.out, f"head_to_head_ref{suffix}.json")
    ref_init_pth = (
        os.path.join(args.out, f"head_to_head_ref_init{suffix}.pth")
        if args.init_from_ref else None
    )
    if args.skip_reference and os.path.exists(ref_state):
        with open(ref_state) as f:
            saved = json.load(f)
        ref_hist, ref_wall = saved["history"], saved["wall"]
        n_train, n_val = saved["n_train"], saved["n_val"]
        # legacy state JSONs recorded only a (possibly tmp-cleaned)
        # ckpt_dir; prefer the durably-copied best_pth when present
        ref_best_pth = saved.get("best_pth") or os.path.join(
            saved["ckpt_dir"], "best_model.pth")
        if not os.path.exists(ref_best_pth):
            raise SystemExit(
                f"--skip-reference: saved checkpoint {ref_best_pth} no "
                "longer exists (tempdir cleaned?); re-run without the flag")
    else:
        ref_hist, ref_wall, n_train, n_val = run_reference(
            args.corpus, args.subset, args.epochs, args.batch_size,
            args.lr, args.weight_decay, args.seed,
            tok_path, vocab_path, args.max_question_length, ref_ckpt_dir,
            dropout=args.dropout, answer_dropout=args.answer_dropout,
            init_dump=ref_init_pth,
        )
        # persist the best checkpoint NEXT TO the state JSON — the tempdir
        # path would not survive /tmp cleanup, breaking --skip-reference
        kept = os.path.join(args.out, f"head_to_head_ref_best{suffix}.pth")
        shutil.copyfile(os.path.join(ref_ckpt_dir, "best_model.pth"), kept)
        ref_best_pth = kept
        with open(ref_state, "w") as f:
            json.dump({"history": ref_hist, "wall": ref_wall,
                       "n_train": n_train, "n_val": n_val,
                       "best_pth": kept}, f)
    print(f"[h2h] reference done in {ref_wall:.0f}s")

    if ref_init_pth is not None and not os.path.exists(ref_init_pth):
        raise SystemExit(
            f"--init-from-ref: {ref_init_pth} missing (the reference run "
            "that dumps it was skipped?); re-run without --skip-reference")
    ours_hist, ours_wall = run_ours(
        args.corpus, args.subset, args.epochs, args.batch_size,
        args.lr, args.weight_decay, args.seed,
        tokenizer, vocab, args.max_question_length,
        os.path.join(tmp, "ours_ckpt"),
        dropout=args.dropout, answer_dropout=args.answer_dropout,
        lr_schedule=args.lr_schedule, init_pth=ref_init_pth,
    )
    print(f"[h2h] ours done in {ours_wall:.0f}s")

    imported = import_and_eval_reference_ckpt(
        ref_best_pth,
        args.corpus, args.subset, args.batch_size,
        tokenizer, vocab, args.max_question_length, args.seed, tmp,
    )

    # --- assemble report ---------------------------------------------------
    def ref_series(name):
        # reference Trainer.train() returns {"history": {name: [[epoch,
        # value], ...]}, "current_epoch": N} (its MetricsLogger.to_dict)
        return [v for _, v in ref_hist.get("history", ref_hist).get(name, [])]

    def our_series(name):
        return list(ours_hist["history"].get(name, []))

    rows = []
    for e in range(args.epochs):
        row = {"epoch": e}
        for k, series in (
            ("ref_train_loss", ref_series("train_loss")),
            ("ref_val_top1", ref_series("val_accuracy")),
            ("our_train_loss", our_series("train_loss")),
            ("our_val_top1", our_series("val_top1")),
        ):
            row[k] = series[e] if e < len(series) else None
        rows.append(row)

    ref_best = max(ref_series("val_accuracy") or [0.0])
    our_best = max(our_series("val_top1") or [0.0])
    result = {
        "subset": args.subset, "epochs": args.epochs,
        "batch_size": args.batch_size, "lr": args.lr,
        "weight_decay": args.weight_decay, "seed": args.seed,
        "n_train": n_train, "n_val": n_val,
        "ref_wall_s": ref_wall, "our_wall_s": ours_wall,
        "ref_best_val_top1": ref_best,
        "our_best_val_top1": our_best,
        "imported_ref_ckpt_val_top1": imported["top1_accuracy"],
        "imported_ref_ckpt_val_top5": imported["top5_accuracy"],
        "curves": rows,
        "controls": {
            "dropout": args.dropout, "answer_dropout": args.answer_dropout,
            "lr_schedule": args.lr_schedule,
            "init_from_ref": args.init_from_ref,
        },
    }
    os.makedirs(args.out, exist_ok=True)
    if args.tag:
        # controlled experiment: JSON artifact only, keep the headline
        # HEAD_TO_HEAD.md untouched
        out_json = os.path.join(args.out, f"h2h_{args.tag}.json")
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps({k: v for k, v in result.items() if k != "curves"},
                         indent=2))
        return
    with open(os.path.join(args.out, "head_to_head.json"), "w") as f:
        json.dump(result, f, indent=2)

    lines = [
        "# Head-to-head training parity vs the reference",
        "",
        "Same corpus, same 80/20 split, same tokenizer/answer-vocab "
        "artifacts, matched hyperparameters (aug off, warmup 0, f32, "
        f"AdamW lr={args.lr} wd={args.weight_decay}, cosine→1e-6, "
        f"clip 1.0, batch {args.batch_size}, seed {args.seed}). "
        f"Corpus: `{args.corpus}` ({n_train} train / {n_val} val). "
        "Reference trained with its own Trainer "
        "(reference: training/train.py:52-398) on CPU via the "
        "torchvision shim in `scripts/ref_compat`.",
        "",
        "| epoch | ref train loss | ours train loss | ref val top-1 | ours val top-1 |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        fmt = lambda v: f"{v:.4f}" if v is not None else "—"
        lines.append(
            f"| {r['epoch']} | {fmt(r['ref_train_loss'])} | "
            f"{fmt(r['our_train_loss'])} | {fmt(r['ref_val_top1'])} | "
            f"{fmt(r['our_val_top1'])} |"
        )
    lines += [
        "",
        f"**Best val top-1:** reference {ref_best:.4f} vs ours "
        f"{our_best:.4f} (Δ {our_best - ref_best:+.4f})",
        "",
        f"**Wall-clock:** reference {ref_wall:.0f}s (CPU) vs ours "
        f"{ours_wall:.0f}s",
        "",
        "**Cross-import check:** the reference-trained `best_model.pth`, "
        "imported with `vqa_tpu.compat.torch_import` and evaluated by OUR "
        f"evaluator on the same val split, scores top-1 "
        f"{imported['top1_accuracy']:.4f} / top-5 "
        f"{imported['top5_accuracy']:.4f} "
        f"(reference's own best: {ref_best:.4f}).",
        "",
    ]
    with open(os.path.join(args.out, "HEAD_TO_HEAD.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({k: v for k, v in result.items() if k != "curves"},
                     indent=2))


if __name__ == "__main__":
    main()
