"""Metrics for VQA training and evaluation.

Same metric semantics as the reference (reference: utils/metrics.py:29-358)
— running top-1/top-5 accuracy, optional per-question-type accuracy, the
official VQA soft accuracy ``min(1, agreement/3)``, confusion matrix and
per-class accuracy, AverageMeter, and a checkpoint-serializable
MetricsLogger — but redesigned for TPU:

- the per-batch math (``topk_correct``, ``vqa_soft_scores``,
  ``confusion_matrix``) are pure jittable functions that stay on device, so
  the train loop never forces a device→host sync per batch (the reference
  calls ``.cpu()`` every batch, utils/metrics.py:81-82, which would
  serialize a TPU pipeline);
- the confusion matrix is a vectorized scatter-add instead of the
  reference's Python double loop (utils/metrics.py:231-233).

Host-side accumulator classes consume the (asynchronously fetched) counts.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Jittable on-device metric math
# ---------------------------------------------------------------------------

def topk_flags(logits: jnp.ndarray, targets: jnp.ndarray, k: int = 5):
    """Per-sample (top1_correct, topk_correct) bool vectors. Jittable.

    logits: [B, num_answers]; targets: [B] int. Top-k membership without a
    full sort: count logits strictly greater than the target's logit; the
    target is in the top-k iff that count < k.
    """
    top1 = jnp.argmax(logits, axis=-1)
    target_logit = jnp.take_along_axis(logits, targets[:, None], axis=-1)
    rank = jnp.sum((logits > target_logit).astype(jnp.int32), axis=-1)
    return top1 == targets, rank < k


def topk_correct(logits: jnp.ndarray, targets: jnp.ndarray, k: int = 5):
    """Return (top1_correct, topk_correct) as int32 counts. Jittable.

    logits: [B, num_answers]; targets: [B] int.
    """
    f1, fk = topk_flags(logits, targets, k)
    return jnp.sum(f1.astype(jnp.int32)), jnp.sum(fk.astype(jnp.int32))


def vqa_soft_scores(pred_idx: jnp.ndarray, annotator_answer_idx: jnp.ndarray):
    """Official VQA soft accuracy per sample: min(1, #agreeing annotators / 3).

    pred_idx: [B] predicted class index.
    annotator_answer_idx: [B, 10] class index of each annotator answer
    (-1 for out-of-vocab). Jittable.
    (Reference semantics: utils/metrics.py:136-184, VQAChallengeAccuracy.)
    """
    agree = jnp.sum(
        (annotator_answer_idx == pred_idx[:, None]).astype(jnp.float32), axis=-1
    )
    return jnp.minimum(1.0, agree / 3.0)


def confusion_matrix(
    preds: jnp.ndarray, targets: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """Vectorized confusion matrix [num_classes, num_classes]: rows=target,
    cols=pred. Jittable scatter-add (vs reference Python loop,
    utils/metrics.py:213-234)."""
    cm = jnp.zeros((num_classes, num_classes), dtype=jnp.int32)
    return cm.at[targets, preds].add(1)


def per_class_accuracy(cm: jnp.ndarray) -> jnp.ndarray:
    """diag / rowsum with 0 for empty classes (reference: utils/metrics.py:237-254)."""
    row = cm.sum(axis=1)
    return jnp.where(row > 0, jnp.diagonal(cm) / jnp.maximum(row, 1), 0.0)


def compute_accuracy(logits, targets, k: int = 5) -> Dict[str, float]:
    """One-shot top-1/top-k accuracy (reference: utils/metrics.py:187-210)."""
    logits = jnp.asarray(logits)
    targets = jnp.asarray(targets)
    c1, ck = topk_correct(logits, targets, k)
    n = targets.shape[0]
    return {"top1": float(c1) / n, f"top{k}": float(ck) / n}


# ---------------------------------------------------------------------------
# Host-side accumulators
# ---------------------------------------------------------------------------

class VQAAccuracy:
    """Running top-1/top-5 accuracy with optional per-question-type breakdown
    (reference: utils/metrics.py:29-133). Feed it *counts* (from
    ``topk_correct``) or raw arrays; state lives on host as plain ints."""

    def __init__(self, top_k: int = 5):
        self.top_k = top_k
        self.reset()

    def reset(self) -> None:
        self.correct_top1 = 0
        self.correct_topk = 0
        self.total = 0
        self.type_correct: Dict[str, int] = {}
        self.type_total: Dict[str, int] = {}

    def update(
        self,
        logits,
        targets,
        question_types: Optional[Sequence[str]] = None,
    ) -> None:
        logits = np.asarray(logits)
        targets = np.asarray(targets)
        c1, ck = topk_correct(jnp.asarray(logits), jnp.asarray(targets), self.top_k)
        self.correct_top1 += int(c1)
        self.correct_topk += int(ck)
        self.total += int(targets.shape[0])
        if question_types is not None:
            preds = np.argmax(logits, axis=-1)
            for qt, p, t in zip(question_types, preds, targets):
                self.type_total[qt] = self.type_total.get(qt, 0) + 1
                if p == t:
                    self.type_correct[qt] = self.type_correct.get(qt, 0) + 1

    def update_counts(self, top1_correct: int, topk_correct_: int, n: int) -> None:
        """Update from pre-reduced on-device counts (TPU-friendly path)."""
        self.correct_top1 += int(top1_correct)
        self.correct_topk += int(topk_correct_)
        self.total += int(n)

    def compute(self) -> Dict[str, float]:
        if self.total == 0:
            return {"top1_accuracy": 0.0, f"top{self.top_k}_accuracy": 0.0}
        out = {
            "top1_accuracy": self.correct_top1 / self.total,
            f"top{self.top_k}_accuracy": self.correct_topk / self.total,
        }
        for qt in self.type_total:
            out[f"type_{qt}_accuracy"] = (
                self.type_correct.get(qt, 0) / self.type_total[qt]
            )
        return out


class VQAChallengeAccuracy:
    """Official VQA challenge soft accuracy accumulator
    (reference: utils/metrics.py:136-184 — implemented there but never
    wired in; here the Evaluator actually reports it when annotator
    answers are available)."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self.score_sum = 0.0
        self.total = 0

    def update(self, pred_idx, annotator_answer_idx) -> None:
        scores = vqa_soft_scores(
            jnp.asarray(pred_idx), jnp.asarray(annotator_answer_idx)
        )
        self.score_sum += float(jnp.sum(scores))
        self.total += int(np.asarray(pred_idx).shape[0])

    def compute(self) -> float:
        return self.score_sum / self.total if self.total else 0.0


class AverageMeter:
    """Running average (reference: utils/metrics.py:257-290)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1) -> None:
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / self.count if self.count else 0.0


class MetricsLogger:
    """Epoch-keyed metric history with best-lookup and dict round-trip for
    checkpoints (reference: utils/metrics.py:293-358). History JSON format
    matches the reference's ``training_history.json``."""

    def __init__(self):
        self.history: Dict[str, List[float]] = {}
        self.epochs: List[int] = []

    def log(self, epoch: int, metrics: Dict[str, float]) -> None:
        if epoch not in self.epochs:
            self.epochs.append(epoch)
        for k, v in metrics.items():
            self.history.setdefault(k, []).append(float(v))

    def get_best(self, metric: str, mode: str = "max"):
        vals = self.history.get(metric, [])
        if not vals:
            return None, None
        fn = max if mode == "max" else min
        best = fn(vals)
        idx = vals.index(best)
        epoch = self.epochs[idx] if idx < len(self.epochs) else idx
        return best, epoch

    def to_dict(self) -> dict:
        return {"history": self.history, "epochs": self.epochs}

    @classmethod
    def from_dict(cls, d: dict) -> "MetricsLogger":
        logger = cls()
        logger.history = {k: list(v) for k, v in d.get("history", {}).items()}
        logger.epochs = list(d.get("epochs", []))
        return logger

    def save(self, filepath: str) -> None:
        d = os.path.dirname(filepath)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(filepath, "w", encoding="utf-8") as f:
            json.dump(self.to_dict(), f, indent=2)
