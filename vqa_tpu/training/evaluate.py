"""Evaluation: accuracy, confusion analysis, error pairs, reports.

Re-design of the reference evaluator (reference: training/evaluate.py:44-402)
with the same outputs — top-1/top-5, per-question-type accuracy, confusion
matrix + per-class accuracy over the top-100 classes, most-common
(pred, target) error pairs decoded through the answer vocab, sample top-5
predictions, text report + JSON results — plus two things the reference
implements but never wires in (SURVEY.md §2.3):

- per-question-type accuracy is actually fed (question types ride in the
  batch metadata);
- the official VQA soft accuracy min(1, agreement/3) is reported whenever
  annotator answers are available.

All batch math runs in one jitted XLA program per batch; the confusion
matrix is a vectorized scatter-add, not the reference's Python loop
(utils/metrics.py:231-233).
"""

from __future__ import annotations

import argparse
import json
import os
from collections import Counter
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.data.dataset import BatchLoader, DemoVQADataset, VQADataset
from vqa_tpu.data.pipeline import prefetch_to_device
from vqa_tpu.data.vocab import AnswerVocabulary
from vqa_tpu.training.train import make_eval_step
from vqa_tpu.utils.metrics import confusion_matrix, per_class_accuracy
from vqa_tpu.utils.tokenizer import Tokenizer


class Evaluator:
    """Full-dataset evaluation with error analysis
    (reference: training/evaluate.py:44-294)."""

    def __init__(
        self,
        model,
        variables,
        answer_vocab: Optional[AnswerVocabulary] = None,
        mesh=None,
    ):
        # optional multi-chip evaluation: batches shard over the mesh's
        # 'data' axis, params follow the TP rules (single-process only —
        # the analysis pulls full per-sample arrays to the host)
        self._sharding = None
        if mesh is not None:
            from vqa_tpu.parallel.mesh import data_sharding, shard_variables

            variables = shard_variables(variables, mesh)
            self._sharding = data_sharding(mesh)
        self.model = model
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.answer_vocab = answer_vocab
        self.eval_step = make_eval_step(model)
        # first-N (logits, token_ids, answer) captured during evaluate() so
        # sample_predictions can decode WITHOUT a second forward pass over
        # the loader (VERDICT r2 weak #4: the CLI path used to run eval twice)
        self._sample_cache: Optional[Dict[str, np.ndarray]] = None
        self._sample_cache_complete = False
        # identity of the loader evaluate() filled the cache from: the
        # cache must never answer sample_predictions for a DIFFERENT loader
        self._sample_cache_loader: Optional[BatchLoader] = None

    def evaluate(
        self,
        loader: BatchLoader,
        top_classes: int = 100,
        sample_cache: int = 64,
    ) -> Dict[str, Any]:
        preds: List[np.ndarray] = []
        targets: List[np.ndarray] = []
        c1 = c5 = n = 0
        loss_sum = 0.0
        type_total: Dict[str, int] = {}
        type_correct: Dict[str, int] = {}
        soft_sum, soft_n = 0.0, 0
        cache = {"logits": [], "token_ids": [], "answer": []}
        cached = 0

        def consume(out, batch):
            nonlocal c1, c5, n, loss_sum, soft_sum, soft_n, cached
            valid = int(batch["valid"])
            pred = np.asarray(out["pred"])[:valid]  # blocks on this batch
            tgt = np.asarray(batch["answer"])[:valid]
            correct1 = np.asarray(out["correct1"])[:valid]
            preds.append(pred)
            targets.append(tgt)
            c1 += int(correct1.sum())
            c5 += int(np.asarray(out["correct5"])[:valid].sum())
            loss_sum += float(np.asarray(out["loss_vec"])[:valid].sum())
            n += valid
            if cached < sample_cache:
                take = min(valid, sample_cache - cached)
                cache["logits"].append(np.asarray(out["logits"])[:take])
                cache["token_ids"].append(np.asarray(batch["token_ids"])[:take])
                cache["answer"].append(np.asarray(batch["answer"])[:take])
                cached += take
            qtypes = batch.get("question_types")
            if qtypes:
                for qt, ok in zip(qtypes[:valid], correct1):
                    type_total[qt] = type_total.get(qt, 0) + 1
                    if ok:
                        type_correct[qt] = type_correct.get(qt, 0) + 1
            ann = batch.get("annotator_answers")
            if ann is not None:
                agree = (np.asarray(ann)[:valid] == pred[:, None]).sum(-1)
                soft_sum += float(np.minimum(1.0, agree / 3.0).sum())
                soft_n += valid

        # lag-1 pipelining: dispatch batch N+1 (async) before fetching
        # batch N's results, so the device-to-host round-trip (which
        # dominates on a tunneled chip) overlaps the next batch's compute
        pending = None
        for batch in prefetch_to_device(loader, sharding=self._sharding):
            out = self.eval_step(
                self.params,
                self.batch_stats,
                batch["image"],
                batch["token_ids"],
                batch["attention_mask"],
                batch["answer"],
            )
            if pending is not None:
                consume(*pending)
            pending = (out, batch)
        if pending is not None:
            consume(*pending)

        if cached:
            self._sample_cache = {
                k: np.concatenate(v) for k, v in cache.items()
            }
            # complete = the cache holds EVERY evaluated sample, so it can
            # satisfy sample_predictions requests larger than its length
            self._sample_cache_complete = cached == n
            self._sample_cache_loader = loader

        preds_all = np.concatenate(preds) if preds else np.zeros(0, np.int32)
        targets_all = np.concatenate(targets) if targets else np.zeros(0, np.int32)
        n = max(n, 1)

        results: Dict[str, Any] = {
            "num_samples": int(len(preds_all)),
            "loss": loss_sum / n,
            "top1_accuracy": c1 / n,
            "top5_accuracy": c5 / n,
            "per_type_accuracy": {
                qt: type_correct.get(qt, 0) / tot
                for qt, tot in sorted(type_total.items())
            },
        }
        if soft_n:
            results["vqa_soft_accuracy"] = soft_sum / soft_n

        # confusion analysis over the most frequent classes
        # (reference: training/evaluate.py:119-125)
        if len(preds_all):
            k = min(top_classes, int(targets_all.max()) + 1)
            sel = (targets_all < k) & (preds_all < k)
            cm = confusion_matrix(
                jnp.asarray(preds_all[sel]), jnp.asarray(targets_all[sel]), k
            )
            pca = per_class_accuracy(cm)
            results["per_class_accuracy_top"] = np.asarray(pca).tolist()
            results["error_pairs"] = self._analyze_errors(preds_all, targets_all)
        return results

    def _analyze_errors(
        self, preds: np.ndarray, targets: np.ndarray, top_n: int = 20
    ) -> List[Dict[str, Any]]:
        """Most common (pred, target) mistakes, decoded
        (reference: training/evaluate.py:141-193)."""
        wrong = preds != targets
        pairs = Counter(zip(preds[wrong].tolist(), targets[wrong].tolist()))
        out = []
        for (p, t), count in pairs.most_common(top_n):
            item = {"predicted": int(p), "target": int(t), "count": int(count)}
            if self.answer_vocab is not None:
                item["predicted_answer"] = self.answer_vocab.decode(p)
                item["target_answer"] = self.answer_vocab.decode(t)
            out.append(item)
        return out

    def _decode_samples(
        self,
        logits: np.ndarray,
        token_ids: np.ndarray,
        answers: np.ndarray,
        tokenizer: Optional[Tokenizer],
        num: int,
    ) -> List[Dict[str, Any]]:
        """softmax + top-5 on host over the whole array — no per-sample
        eager device dispatches (those would each compile a tiny program,
        tens of seconds cold over the TPU tunnel)."""
        take = min(num, len(logits))
        logits = logits[:take]
        z = logits - logits.max(axis=-1, keepdims=True)
        probs = np.exp(z)
        probs /= probs.sum(axis=-1, keepdims=True)
        top_i = np.argsort(-probs, axis=-1)[:, :5]
        top_p = np.take_along_axis(probs, top_i, axis=-1)
        samples = []
        for i in range(take):
            entry = {
                "target": int(answers[i]),
                "top5_indices": top_i[i].tolist(),
                "top5_probs": top_p[i].tolist(),
            }
            if tokenizer is not None:
                entry["question"] = tokenizer.decode(token_ids[i])
            if self.answer_vocab is not None:
                entry["target_answer"] = self.answer_vocab.decode(
                    int(answers[i])
                )
                entry["top5_answers"] = [
                    self.answer_vocab.decode(int(j)) for j in top_i[i]
                ]
            samples.append(entry)
        return samples

    def sample_predictions(
        self, loader: BatchLoader, tokenizer: Optional[Tokenizer], num: int = 20
    ) -> List[Dict[str, Any]]:
        """Decoded sample top-5 predictions
        (reference: training/evaluate.py:195-244).

        Single-pass: when ``evaluate()`` already ran on THIS loader, its
        cached first-N logits are decoded directly — zero extra forwards
        (the reference, and round 2 of this rebuild, re-ran the whole
        forward pass here). Falls back to running forwards if evaluate()
        was never called, ran on a different loader, or cached fewer
        samples than requested."""
        cache = self._sample_cache
        if cache is not None and loader is self._sample_cache_loader and (
            len(cache["logits"]) >= num or self._sample_cache_complete
        ):
            return self._decode_samples(
                cache["logits"], cache["token_ids"], cache["answer"],
                tokenizer, num,
            )
        samples: List[Dict[str, Any]] = []
        for batch in loader:
            out = self.eval_step(
                self.params,
                self.batch_stats,
                jnp.asarray(batch["image"]),
                jnp.asarray(batch["token_ids"]),
                jnp.asarray(batch["attention_mask"]),
                jnp.asarray(batch["answer"]),
            )
            valid = int(batch["valid"])
            samples.extend(
                self._decode_samples(
                    np.asarray(out["logits"])[:valid],
                    np.asarray(batch["token_ids"])[:valid],
                    np.asarray(batch["answer"])[:valid],
                    tokenizer,
                    num - len(samples),
                )
            )
            if len(samples) >= num:
                break
        return samples

    def generate_report(self, results: Dict[str, Any]) -> str:
        """Text report (reference: training/evaluate.py:246-294)."""
        lines = [
            "=" * 60,
            "VQA Evaluation Report",
            "=" * 60,
            f"samples:        {results['num_samples']}",
            f"loss:           {results['loss']:.4f}",
            f"top-1 accuracy: {results['top1_accuracy']:.4f}",
            f"top-5 accuracy: {results['top5_accuracy']:.4f}",
        ]
        if "vqa_soft_accuracy" in results:
            lines.append(f"VQA soft acc:   {results['vqa_soft_accuracy']:.4f}")
        if results.get("per_type_accuracy"):
            lines.append("\nPer-question-type accuracy:")
            for qt, acc in results["per_type_accuracy"].items():
                lines.append(f"  {qt:30s} {acc:.4f}")
        if results.get("error_pairs"):
            lines.append("\nMost common errors (pred ← target):")
            for e in results["error_pairs"][:10]:
                p = e.get("predicted_answer", e["predicted"])
                t = e.get("target_answer", e["target"])
                lines.append(f"  {p!s:20s} ← {t!s:20s} ×{e['count']}")
        lines.append("=" * 60)
        return "\n".join(lines)


# ---------------------------------------------------------------------------
# CLI (reference: training/evaluate.py:297-402)
# ---------------------------------------------------------------------------

def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a VQA checkpoint")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--checkpoint", default="best_model")
    p.add_argument("--questions", default=None)
    p.add_argument("--annotations", default=None)
    p.add_argument("--images-dir", default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--max-samples", type=int, default=5000)
    p.add_argument("--demo", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="evaluate on the learnable colored-shapes val split "
                        "(data/synthetic.py; seed-matched to --synthetic "
                        "training)")
    p.add_argument("--output-dir", default=None)
    # multi-chip evaluation (batches shard over the 'data' mesh axis)
    p.add_argument("--data-parallel", type=int, default=None)
    p.add_argument("--model-parallel", type=int, default=None)
    from vqa_tpu.utils.platform import add_platform_args

    add_platform_args(p)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute for the eval forward (~2x faster on "
                        "TPU; default f32 exactly like the reference "
                        "evaluator, reference: training/evaluate.py:77-139 "
                        "— top-1/top-5 are argmax-stable but per-sample "
                        "probabilities shift at the bf16 epsilon)")
    return p.parse_args(argv)


def main(argv=None):
    from vqa_tpu.training.checkpoint import load_model_for_inference
    from vqa_tpu.utils.cache import enable_compilation_cache

    from vqa_tpu.utils.platform import apply_platform_args

    args = parse_args(argv)
    # platform forcing MUST precede the first backend touch
    apply_platform_args(args)
    enable_compilation_cache()

    from vqa_tpu.training.checkpoint import checkpoint_exists

    name = args.checkpoint
    if not checkpoint_exists(args.checkpoint_dir, name) and checkpoint_exists(
        args.checkpoint_dir, "latest"
    ):
        # a run whose val accuracy never improved has no best_model copy
        print(f"[Evaluator] no '{name}' checkpoint — falling back to 'latest'")
        name = "latest"
    import jax.numpy as _jnp

    model, variables = load_model_for_inference(
        args.checkpoint_dir, name,
        dtype=_jnp.bfloat16 if args.bf16 else None,
    )
    cfg = model.config

    tokenizer = answer_vocab = None
    tok_path = os.path.join(args.checkpoint_dir, "tokenizer.json")
    vocab_path = os.path.join(args.checkpoint_dir, "answer_vocab.json")
    if os.path.exists(tok_path):
        tokenizer = Tokenizer()
        tokenizer.load(tok_path)
    if os.path.exists(vocab_path):
        answer_vocab = AnswerVocabulary()
        answer_vocab.load(vocab_path)

    # demo fallback unless ALL real-data paths are present on disk
    # (reference: training/evaluate.py:345-380; a partial path set
    # previously crashed with TypeError on open(None))
    real_paths = [args.questions, args.annotations, args.images_dir]
    have_real = all(p and os.path.exists(p) for p in real_paths)
    if args.synthetic:
        from vqa_tpu.data.synthetic import create_synthetic_loaders
        from vqa_tpu.training.checkpoint import load_checkpoint_meta

        # Rebuild the EXACT val split of the training run: scenes are
        # deterministic per (seed, index), so a split rebuilt with a
        # different num_samples would lie inside the training index range
        # (trained-on scenes scored as 'val'). The spec rides in the
        # checkpoint sidecar (Trainer run_meta).
        syn_spec = (load_checkpoint_meta(args.checkpoint_dir, name) or {}).get(
            "synthetic"
        )
        spatial = False
        if syn_spec:
            num_samples, seed = int(syn_spec["num_samples"]), int(syn_spec["seed"])
            # spatial variant changes questions AND the answer vocab —
            # sidecars older than the flag default to the plain mix
            spatial = bool(syn_spec.get("spatial", False))
        else:
            num_samples, seed = max(args.max_samples, 64), 42
            print(
                "[Evaluator] WARNING: checkpoint has no synthetic-split "
                "metadata (pre-r2 or non-synthetic training run); the "
                "rebuilt val split may overlap the training scenes"
            )
        _, loader, syn_tok, syn_vocab = create_synthetic_loaders(
            num_samples=num_samples,
            eval_batch_size=args.batch_size,
            image_size=cfg.image_size,
            max_question_length=cfg.max_question_length,
            seed=seed,
            spatial=spatial,
        )
        # --max-samples still caps WORK: truncate the (exactly rebuilt)
        # val index range rather than silently evaluating the full split —
        # the indices stay inside the held-out range either way
        if args.max_samples and len(loader.indices) > args.max_samples:
            loader.indices = loader.indices[: args.max_samples]
            print(f"[Evaluator] --max-samples caps the val split to "
                  f"{args.max_samples} of {num_samples - int(num_samples * 0.8)}")
        # decode with the SAME vocab that labeled the loader — a stale
        # answer_vocab.json (e.g. real-data checkpoint evaluated with
        # --synthetic) would silently mislabel indices
        if answer_vocab is not None and answer_vocab.answer2idx != syn_vocab.answer2idx:
            print(
                "[Evaluator] WARNING: checkpoint answer vocab differs from "
                "the synthetic answer set — decoding with the synthetic vocab"
            )
        answer_vocab = syn_vocab
        tokenizer = syn_tok
    elif args.demo or not have_real:
        if not args.demo and any(real_paths):
            print("[Evaluator] real-data paths missing/incomplete — demo data")
        ds = DemoVQADataset(
            num_samples=min(args.max_samples, 256),
            image_size=cfg.image_size,
            max_question_length=cfg.max_question_length,
            vocab_size=cfg.vocab_size,
            num_answers=cfg.num_answers,
        )
        loader = BatchLoader(ds, args.batch_size, drop_last=False)
    else:
        ds = VQADataset(
            args.questions, args.annotations, args.images_dir,
            tokenizer=tokenizer, answer_vocab=answer_vocab,
            num_answers=cfg.num_answers,
            max_question_length=cfg.max_question_length,
            max_samples=args.max_samples, is_training=False,
            image_size=cfg.image_size,
        )
        loader = BatchLoader(ds, args.batch_size, drop_last=False)

    mesh = None
    if args.data_parallel is not None or args.model_parallel is not None:
        from vqa_tpu.parallel.mesh import mesh_from_config
        from vqa_tpu.utils.config import MeshConfig

        mesh = mesh_from_config(
            MeshConfig(
                data_parallel=args.data_parallel or -1,
                model_parallel=args.model_parallel or 1,
            ),
            batch_divisor=args.batch_size,
        )
    ev = Evaluator(model, variables, answer_vocab, mesh=mesh)
    results = ev.evaluate(loader)
    # decoded sample top-5 predictions ride in the results artifact
    # (reference: training/evaluate.py:386-389)
    results["sample_predictions"] = ev.sample_predictions(loader, tokenizer)
    report = ev.generate_report(results)
    print(report)

    out_dir = args.output_dir or args.checkpoint_dir
    os.makedirs(out_dir, exist_ok=True)
    # reference-compatible aliases so tooling that reads the reference's
    # evaluation_results.json works on ours unchanged
    # (reference: training/evaluate.py:130-137 key names)
    artifact = dict(results)
    aliases = {
        "accuracy": results.get("top1_accuracy"),
        "accuracy_top5": results.get("top5_accuracy"),
        "total_samples": results.get("num_samples"),
        "per_class_accuracy": results.get("per_class_accuracy_top"),
    }
    if results.get("error_pairs") is not None:
        # the reference's error entries are {predicted_idx, target_idx,
        # count, predicted=<decoded str>, target=<decoded str>}
        # (reference: training/evaluate.py:181-190) — ours use predicted/
        # target for the ints, so a key-rename alone would silently hand
        # reference tooling ints where it expects strings
        aliases["common_errors"] = [
            {
                "predicted_idx": e["predicted"],
                "target_idx": e["target"],
                "count": e["count"],
                **(
                    {
                        "predicted": e["predicted_answer"],
                        "target": e["target_answer"],
                    }
                    if "predicted_answer" in e
                    else {}
                ),
            }
            for e in results["error_pairs"]
        ]
    if results.get("num_samples") and results.get("top1_accuracy") is not None:
        aliases["correct"] = round(
            results["top1_accuracy"] * results["num_samples"]
        )
    artifact.update({k: v for k, v in aliases.items() if v is not None})
    with open(os.path.join(out_dir, "evaluation_results.json"), "w") as f:
        json.dump(artifact, f, indent=2)
    with open(os.path.join(out_dir, "evaluation_report.txt"), "w") as f:
        f.write(report)
    return results


if __name__ == "__main__":
    main()
