"""Synthetic learnable VQA data tests (data/synthetic.py): protocol,
determinism, answer consistency, and — the point of the dataset — that a
model actually LEARNS from it (random demo data can never show that)."""

import jax
import numpy as np

from vqa_tpu.data.synthetic import (
    ANSWERS,
    SyntheticVQADataset,
    create_synthetic_loaders,
)
from vqa_tpu.models import create_vqa_model, init_vqa_model
from vqa_tpu.training.train import Trainer
from vqa_tpu.utils.config import TrainingConfig

S = 32


def test_sample_protocol_and_determinism():
    ds = SyntheticVQADataset(num_samples=20, image_size=S, is_training=False,
                             max_question_length=8)
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a["image"], b["image"])
    assert a["image"].shape == (S, S, 3)
    assert a["token_ids"].shape == (8,)
    assert 0 <= a["answer"] < len(ANSWERS)
    assert a["question_type"] in ("what color", "how many", "is there")
    assert a["annotator_answers"].shape == (10,)
    # different indices → different scenes
    assert np.abs(ds[0]["image"] - ds[1]["image"]).max() > 0


def test_answers_are_consistent_with_scenes():
    """'how many shapes' answers match the rendered scene count proxy:
    count distribution covers 1..3 and color answers are real colors."""
    ds = SyntheticVQADataset(num_samples=300, image_size=S, is_training=False,
                             max_question_length=8)
    counts = set()
    for i in range(300):
        s = ds[i]
        ans = ds.answer_vocab.decode(s["answer"])
        assert ans in ANSWERS
        if s["question_type"] == "how many":
            counts.add(ans)
    assert counts == {"1", "2", "3"}


def test_model_learns_from_synthetic_data():
    """A tiny model beats chance comfortably after a short training run —
    the end-to-end 'this framework trains' check."""
    train_loader, val_loader, tok, vocab = create_synthetic_loaders(
        num_samples=640, batch_size=16, eval_batch_size=16, image_size=S,
        max_question_length=8,
    )
    model = create_vqa_model(
        vocab_size=tok.vocab_size, num_answers=vocab.num_answers,
        embed_dim=32, num_transformer_layers=1, num_attention_heads=2,
        ffn_hidden_dim=64, max_question_length=8, image_size=S,
        base_channels=16, stage_channels=(16, 32, 64, 128),
        feature_spatial_size=1,
    )
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    trainer = Trainer(
        model, variables, train_loader, val_loader,
        config=TrainingConfig(
            num_epochs=8, batch_size=16, warmup_epochs=0, learning_rate=3e-3
        ),
        save_checkpoints=False,
    )
    logger = trainer.train()
    final_val = logger.history["val_top1"][-1]
    best_val = max(logger.history["val_top1"])
    print(f"synthetic learning: val_top1 history {logger.history['val_top1']}")
    # chance is ~1/11 ≈ 0.09; majority-guessing plateaus well under 0.3
    assert best_val > 0.3, f"model failed to learn (best val_top1={best_val})"
    assert logger.history["train_loss"][-1] < logger.history["train_loss"][0]


def test_spatial_variant_questions_and_vocab():
    """spatial=True mixes grid-localized questions whose answers require
    localization; answer vocab covers shapes too; default variant unchanged."""
    from vqa_tpu.data.synthetic import (
        POSITIONS, SPATIAL_ANSWERS, SyntheticVQADataset,
    )

    ds = SyntheticVQADataset(
        num_samples=64, image_size=64, max_question_length=12, spatial=True,
        is_training=False,
    )
    assert ds.type_vocab() == sorted(
        ["how many", "is there", "what color",
         "what color where", "what shape where"]
    )
    assert ds.answer_vocab.num_answers == len(SPATIAL_ANSWERS)
    qtypes = set()
    for i in range(64):
        s = ds[i]
        qtypes.add(s["question_type"])
        q = ds.tokenizer.decode(s["token_ids"])
        if s["question_type"].endswith("where"):
            assert any(p in q for p in POSITIONS), q
    # both spatial families actually appear in 64 draws
    assert "what color where" in qtypes and "what shape where" in qtypes
    # the non-spatial stream is untouched (same scenes/questions as before)
    base = SyntheticVQADataset(
        num_samples=4, image_size=64, max_question_length=12,
        is_training=False,
    )
    assert base.type_vocab() == ["how many", "is there", "what color"]
    for i in range(4):
        assert base[i]["question_type"] in base.type_vocab()


def test_spatial_rendering_larger_shapes_exact_cells():
    """SPATIAL_DRAW renders bigger shapes (so 'what shape where' is
    learnable — VERDICT r3 weak #1) while every colored pixel stays inside
    the labeled 2x2 cell (position labels stay exact)."""
    import numpy as np

    from vqa_tpu.data.synthetic import SPATIAL_DRAW, _draw_scene

    size = 224
    half = size // 2
    areas_default, areas_spatial = [], []
    checked = 0
    for seed in range(40):
        # same seed → same scene structure; only the draw params differ
        img_d, placed_d = _draw_scene(np.random.default_rng(seed), size)
        img_s, placed_s = _draw_scene(
            np.random.default_rng(seed), size, **SPATIAL_DRAW
        )
        arr = np.asarray(img_s, np.int32)
        fg = (np.abs(arr - arr[0, 0]).sum(-1) > 60)  # far from bg color
        areas_default.append(
            (np.abs(np.asarray(img_d, np.int32) - np.asarray(
                img_d, np.int32)[0, 0]).sum(-1) > 60).mean()
        )
        areas_spatial.append(fg.mean())
        # no foreground pixel of ANY shape may fall outside the union of
        # the labeled cells: fg ⊆ union of quads
        union = np.zeros_like(fg)
        for _, _, cell in placed_s:
            y0, y1 = (cell // 2) * half, (cell // 2) * half + half
            x0, x1 = (cell % 2) * half, (cell % 2) * half + half
            union[y0:y1, x0:x1] = True
        assert not (fg & ~union).any(), f"seed {seed}: shape leaked its cell"
        checked += len(placed_s)
    assert checked > 40
    # spatial scenes carry meaningfully more shape pixels than default ones
    assert np.mean(areas_spatial) > 1.4 * np.mean(areas_default)


def test_corpus_generator_round_trips_through_real_data_path(tmp_path):
    """make_vqa_corpus writes the exact VQA-v2/COCO on-disk layout; the
    real-data VQADataset path consumes it, and the annotator answers carry
    realistic disagreement for the soft accuracy."""
    import sys

    sys.path.insert(0, "scripts")
    from make_vqa_corpus import make_corpus

    meta = make_corpus(
        str(tmp_path), num_images=10, questions_per_image=3,
        image_size=96, annotator_noise=0.2, quality=70,
    )
    assert meta["num_questions"] >= 20
    from vqa_tpu.data.dataset import BatchLoader, VQADataset

    ds = VQADataset(
        str(tmp_path / "questions.json"),
        str(tmp_path / "annotations.json"),
        str(tmp_path / "images"),
        num_answers=16, max_question_length=12, vocab_size=60,
        is_training=False, image_size=64,
    )
    assert len(ds) >= 20
    batch = next(iter(BatchLoader(ds, 8, drop_last=False)))
    assert batch["annotator_answers"].shape == (8, 10)
    # disagreement exists but the majority agrees with the target
    agree = (batch["annotator_answers"] == batch["answer"][:, None]).sum(1)
    assert agree.min() >= 5
    assert (batch["annotator_answers"] >= 0).mean() > 0.5
    # determinism: same seed → identical questions file
    import filecmp

    out2 = tmp_path / "again"
    make_corpus(
        str(out2), num_images=10, questions_per_image=3,
        image_size=96, annotator_noise=0.2, quality=70,
    )
    assert filecmp.cmp(
        tmp_path / "questions.json", out2 / "questions.json", shallow=False
    )
