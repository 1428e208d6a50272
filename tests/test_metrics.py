"""Metric math tests (mirrors reference utils/metrics.py semantics)."""

import jax.numpy as jnp
import numpy as np

from vqa_tpu.utils.metrics import (
    AverageMeter,
    MetricsLogger,
    VQAAccuracy,
    VQAChallengeAccuracy,
    compute_accuracy,
    confusion_matrix,
    per_class_accuracy,
    topk_correct,
    vqa_soft_scores,
)


def test_topk_correct():
    logits = jnp.array(
        [
            [0.1, 0.9, 0.0, 0.0],  # pred 1
            [0.9, 0.1, 0.0, 0.0],  # pred 0
            [0.3, 0.2, 0.4, 0.1],  # pred 2
        ]
    )
    targets = jnp.array([1, 1, 3])
    c1, c2 = topk_correct(logits, targets, k=2)
    assert int(c1) == 1  # only first sample top-1 correct
    assert int(c2) == 2  # first (rank0) and second (target rank1)


def test_compute_accuracy_matches_numpy():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(64, 10)).astype(np.float32)
    targets = rng.integers(0, 10, size=64)
    out = compute_accuracy(logits, targets, k=5)
    np_top1 = (logits.argmax(-1) == targets).mean()
    order = np.argsort(-logits, axis=-1)[:, :5]
    np_top5 = np.mean([t in o for t, o in zip(targets, order)])
    assert abs(out["top1"] - np_top1) < 1e-6
    assert abs(out["top5"] - np_top5) < 1e-6


def test_vqa_soft_scores():
    pred = jnp.array([0, 1])
    ann = jnp.array([[0, 0, 0, 0, 1, 1, 1, 1, 1, 1], [1, 1, -1] + [-1] * 7])
    s = vqa_soft_scores(pred, ann)
    assert float(s[0]) == 1.0  # 4 agreements -> min(1, 4/3)
    assert abs(float(s[1]) - 2 / 3) < 1e-6


def test_confusion_matrix_vectorized():
    preds = jnp.array([0, 1, 1, 2])
    targets = jnp.array([0, 1, 2, 2])
    cm = confusion_matrix(preds, targets, 3)
    expected = np.array([[1, 0, 0], [0, 1, 0], [0, 1, 1]])
    np.testing.assert_array_equal(np.asarray(cm), expected)
    pca = per_class_accuracy(cm)
    np.testing.assert_allclose(np.asarray(pca), [1.0, 1.0, 0.5])


def test_vqa_accuracy_accumulator():
    acc = VQAAccuracy(top_k=2)
    logits = np.eye(4, dtype=np.float32)
    acc.update(logits, np.array([0, 1, 2, 0]),
               question_types=["what", "what", "is", "is"])
    out = acc.compute()
    assert abs(out["top1_accuracy"] - 0.75) < 1e-9
    assert out["type_what_accuracy"] == 1.0
    assert out["type_is_accuracy"] == 0.5


def test_challenge_accuracy_accumulator():
    acc = VQAChallengeAccuracy()
    acc.update(np.array([0]), np.array([[0, 0, 0] + [-1] * 7]))
    assert abs(acc.compute() - 1.0) < 1e-9


def test_meter_and_logger(tmp_path):
    m = AverageMeter("loss")
    m.update(2.0, n=2)
    m.update(4.0, n=2)
    assert m.avg == 3.0

    lg = MetricsLogger()
    lg.log(1, {"val_acc": 0.5})
    lg.log(2, {"val_acc": 0.7})
    best, epoch = lg.get_best("val_acc")
    assert best == 0.7 and epoch == 2
    lg2 = MetricsLogger.from_dict(lg.to_dict())
    assert lg2.history == lg.history
    lg2.save(str(tmp_path / "hist.json"))
