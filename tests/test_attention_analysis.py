"""Attention-faithfulness analysis: quadrant-mass math + model plumbing.

The reference only ever visualizes cross-attention maps (reference:
models/fusion.py:338-363); vqa_tpu.utils.attention_analysis turns them
into a measurable quantity with a 0.25 uniform baseline. The math is
tested exactly here; the trained-model measurement on the held-out
spatial corpus is produced on-chip by scripts/attention_faithfulness.py
(docs/ATTENTION_FAITHFULNESS.json) and an in-test trained check runs
under -m slow.
"""

import numpy as np
import pytest

from vqa_tpu.utils.attention_analysis import (
    QUADRANT_NAMES,
    aggregate_token_maps,
    position_from_question,
    quadrant_masses,
    quadrant_slices,
)


def test_quadrant_slices_even_and_odd():
    # even side: quadrants tile the grid exactly
    slices = quadrant_slices(4)
    cover = np.zeros((4, 4), int)
    for rs, cs in slices:
        cover[rs, cs] += 1
    assert (cover == 1).all()
    # odd side: middle row/col belongs to no quadrant
    slices = quadrant_slices(7)
    cover = np.zeros((7, 7), int)
    for rs, cs in slices:
        cover[rs, cs] += 1
    assert (cover[3, :] == 0).all() and (cover[:, 3] == 0).all()
    assert cover.sum() == 36 and cover.max() == 1


def test_uniform_attention_scores_exactly_quarter():
    for side in (4, 7):
        attn = np.full((2, 5, side, side), 1.0 / side**2)
        masses = quadrant_masses(attn)
        assert masses.shape == (2, 4)
        np.testing.assert_allclose(masses, 0.25, atol=1e-12)


def test_delta_attention_lands_in_its_quadrant():
    # all mass on one cell of each quadrant → that quadrant gets ~1
    for q, (rs, cs) in enumerate(quadrant_slices(7)):
        attn = np.zeros((1, 3, 7, 7))
        attn[:, :, rs.start, cs.start] = 1.0
        masses = quadrant_masses(attn)
        assert masses[0, q] == pytest.approx(1.0)
        assert masses[0].sum() == pytest.approx(1.0)


def test_middle_row_mass_is_excluded_from_quadrants():
    # mass split between the (excluded) middle cell and the top-left
    # quadrant: normalization over quadrants must credit top-left fully
    attn = np.zeros((1, 1, 7, 7))
    attn[0, 0, 3, 3] = 0.9
    attn[0, 0, 0, 0] = 0.1
    masses = quadrant_masses(attn)
    assert masses[0, 0] == pytest.approx(1.0)


def test_mask_weighted_token_aggregation():
    # two tokens: a real one attending top-left, a PAD one attending
    # bottom-right; the PAD token must not contribute
    attn = np.zeros((1, 2, 4, 4))
    attn[0, 0, 0, 0] = 1.0  # real token → top left
    attn[0, 1, 3, 3] = 1.0  # pad token → bottom right
    mask = np.array([[1, 0]])
    agg = aggregate_token_maps(attn, mask)
    assert agg[0, 0, 0] == pytest.approx(1.0)
    masses = quadrant_masses(attn, mask)
    assert masses[0, 0] == pytest.approx(1.0)
    # without the mask both tokens count
    masses_nomask = quadrant_masses(attn)
    assert masses_nomask[0, 0] == pytest.approx(0.5)
    assert masses_nomask[0, 3] == pytest.approx(0.5)


def test_quadrant_masses_rejects_bad_shapes():
    with pytest.raises(ValueError, match="expected"):
        quadrant_masses(np.zeros((2, 3)))
    with pytest.raises(ValueError, match="expected"):
        quadrant_masses(np.zeros((1, 2, 4, 5)))  # non-square


def test_position_from_question_matches_synthetic_templates():
    from vqa_tpu.data.synthetic import POSITIONS

    assert tuple(QUADRANT_NAMES) == POSITIONS
    for idx, pos in enumerate(POSITIONS):
        assert position_from_question(
            f"what color is the shape in the {pos}") == idx
        assert position_from_question(f"What shape is in the {pos}?") == idx
    assert position_from_question("how many shapes are there") is None


def test_model_plumbing_produces_normalized_quadrant_masses():
    """End-to-end through a real (random-weight) model: aux cross-attention
    weights → attention_visualization → quadrant_masses yields [B, 4] rows
    summing to 1 — the exact pipeline scripts/attention_faithfulness.py
    and the /attention endpoint rely on."""
    import jax

    from vqa_tpu.models import create_vqa_model, init_vqa_model
    from vqa_tpu.models.fusion import attention_visualization
    from vqa_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, embed_dim=32, num_transformer_layers=1,
        num_attention_heads=2, ffn_hidden_dim=64, num_cross_layers=2,
        num_answers=10,
    )
    model = create_vqa_model(config=cfg, dtype=None)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    b, lq = 2, cfg.max_question_length
    images = np.zeros((b, cfg.image_size, cfg.image_size, 3), np.float32)
    ids = np.ones((b, lq), np.int32)
    mask = np.concatenate(
        [np.ones((b, 5), np.int32), np.zeros((b, lq - 5), np.int32)], axis=1
    )
    _, aux = model.apply(
        variables, images, ids, mask, train=False, return_aux=True
    )
    maps = attention_visualization(
        aux["cross_attention_weights"], cfg.feature_spatial_size
    )
    assert maps.shape == (b, lq, cfg.feature_spatial_size,
                          cfg.feature_spatial_size)
    masses = quadrant_masses(np.asarray(maps), mask)
    assert masses.shape == (b, 4)
    np.testing.assert_allclose(masses.sum(axis=1), 1.0, atol=1e-6)
    assert (masses >= 0).all()


@pytest.mark.slow
def test_trained_model_attends_to_queried_quadrant():
    """A model overfit on spatially-grounded questions places more
    cross-attention mass in the queried quadrant than the 0.25 uniform
    baseline (the measurable form of 'localization lives in the
    cross-attention fusion', docs/ARCHITECTURE.md). Full-size on-chip
    measurement: scripts/attention_faithfulness.py."""
    import jax

    from vqa_tpu.data.synthetic import create_synthetic_loaders
    from vqa_tpu.models import create_vqa_model, init_vqa_model
    from vqa_tpu.models.fusion import attention_visualization
    from vqa_tpu.training.train import Trainer
    from vqa_tpu.utils.attention_analysis import position_from_question
    from vqa_tpu.utils.config import ModelConfig, TrainingConfig

    train_loader, val_loader, tokenizer, vocab = create_synthetic_loaders(
        num_samples=256, batch_size=32, image_size=224, spatial=True,
        seed=7,
    )
    cfg = ModelConfig(
        vocab_size=tokenizer.vocab_size, embed_dim=64,
        num_transformer_layers=2, num_attention_heads=4,
        ffn_hidden_dim=128, num_cross_layers=2,
        num_answers=len(vocab.answer_to_idx), dropout=0.0,
        answer_dropout=0.0,
    )
    model = create_vqa_model(config=cfg, dtype=None)
    variables = init_vqa_model(model, jax.random.PRNGKey(7))
    tcfg = TrainingConfig(
        batch_size=32, num_epochs=6, warmup_epochs=1, use_bf16=False,
        seed=7,
    )
    trainer = Trainer(model, variables, train_loader, val_loader,
                      config=tcfg, checkpoint_dir=None, seed=7)
    trainer.train(patience=99)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}

    # held-out spatial questions
    ds = val_loader.dataset
    masses_at_queried = []
    for idx in val_loader.indices[:64]:
        s = ds[int(idx)]
        q = tokenizer.decode(s["token_ids"])
        pos = position_from_question(q)
        if pos is None:
            continue
        _, aux = model.apply(
            variables, s["image"][None], s["token_ids"][None],
            s["attention_mask"][None], train=False, return_aux=True,
        )
        maps = attention_visualization(
            aux["cross_attention_weights"], cfg.feature_spatial_size
        )
        m = quadrant_masses(np.asarray(maps), s["attention_mask"][None])
        masses_at_queried.append(m[0, pos])
    assert len(masses_at_queried) >= 10
    mean_mass = float(np.mean(masses_at_queried))
    assert mean_mass > 0.25, (
        f"trained model's queried-quadrant mass {mean_mass:.3f} does not "
        f"beat the uniform baseline over {len(masses_at_queried)} questions"
    )
