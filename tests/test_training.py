"""Training-loop tests: seeded overfit (the reference's reproduce_issue.py
gradient-flow bisector), demo-data end-to-end run, checkpoint resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_tpu.data.dataset import DemoVQADataset, BatchLoader, create_demo_loaders
from vqa_tpu.models import create_vqa_model, init_vqa_model
from vqa_tpu.training.train import (
    TrainState,
    Trainer,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from vqa_tpu.utils.config import TrainingConfig

TINY = dict(
    vocab_size=50,
    num_answers=8,
    embed_dim=16,
    num_transformer_layers=1,
    num_attention_heads=2,
    ffn_hidden_dim=32,
    max_question_length=6,
    image_size=32,
    base_channels=8,
    stage_channels=(8, 16, 32, 64),
    feature_spatial_size=1,
)


def _tiny_setup(num_answers=8, lr=3e-3, steps_per_epoch=10, epochs=5):
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0), batch_size=4)
    cfg = TrainingConfig(
        learning_rate=lr, warmup_epochs=0, num_epochs=epochs, batch_size=4
    )
    tx, sched = make_optimizer(cfg, steps_per_epoch)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables["batch_stats"],
    )
    return model, state


def test_overfit_single_batch():
    """Seeded single-batch overfit — gradients must flow end to end
    (reference: reproduce_issue.py:16-78, SUCCESS = acc > 0.9)."""
    # epochs=20 so the cosine schedule stays near peak LR for all 60 steps
    model, state = _tiny_setup(lr=3e-3, steps_per_epoch=60, epochs=20)
    train_step = make_train_step(model)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(4, 50, size=(8, 6)), jnp.int32)
    mask = jnp.ones((8, 6), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 8, size=(8,)), jnp.int32)
    key = jax.random.PRNGKey(1)

    first_loss = None
    for step in range(80):
        state, m = train_step(state, images, ids, mask, labels, key)
        if first_loss is None:
            first_loss = float(m["loss"])
    # final accuracy in eval mode (train-mode logits carry dropout noise)
    eval_step = make_eval_step(model)
    out = eval_step(state.params, state.batch_stats, images, ids, mask, labels)
    acc = int(jnp.sum(out["correct1"])) / 8
    print(f"overfit: loss {first_loss:.3f} -> {float(m['loss']):.3f}, acc {acc}")
    assert float(m["loss"]) < first_loss
    assert acc > 0.9, "model failed to overfit a single batch"


def test_eval_step_counts():
    model, state = _tiny_setup()
    eval_step = make_eval_step(model)
    rng = np.random.default_rng(1)
    out = eval_step(
        state.params,
        state.batch_stats,
        jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32),
        jnp.asarray(rng.integers(4, 50, size=(4, 6)), jnp.int32),
        jnp.ones((4, 6), jnp.int32),
        jnp.asarray([0, 1, 2, 3], jnp.int32),
    )
    assert out["pred"].shape == (4,)
    assert out["logits"].shape == (4, 8)
    assert bool(jnp.all(out["correct1"] <= out["correct5"]))


def test_trainer_demo_end_to_end(tmp_path):
    """Two epochs on demo data: runs, logs, checkpoints, early-stop fields."""
    train_loader, val_loader = create_demo_loaders(
        batch_size=4, eval_batch_size=4, num_samples=24,
        image_size=32, max_question_length=6, vocab_size=50, num_answers=8,
    )
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    cfg = TrainingConfig(
        num_epochs=2, batch_size=4, warmup_epochs=0, learning_rate=1e-3
    )
    trainer = Trainer(
        model, variables, train_loader, val_loader, config=cfg,
        checkpoint_dir=str(tmp_path), save_checkpoints=True,
    )
    logger = trainer.train()
    assert len(logger.history["train_loss"]) == 2
    assert "val_top1" in logger.history
    # a completed run always leaves a resumable checkpoint
    assert os.path.exists(os.path.join(tmp_path, "latest.meta.json"))


def test_trainer_writes_tensorboard_scalars(tmp_path):
    """log_dir is real (unlike the reference, which configures one and never
    writes to it — SURVEY §5): one epoch produces per-epoch scalars, either
    TensorBoard event files or the JSONL fallback."""
    train_loader, val_loader = create_demo_loaders(
        batch_size=4, eval_batch_size=4, num_samples=8,
        image_size=32, max_question_length=6, vocab_size=50, num_answers=8,
    )
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    cfg = TrainingConfig(
        num_epochs=1, batch_size=4, warmup_epochs=0, learning_rate=1e-3
    )
    log_dir = str(tmp_path / "tb")
    trainer = Trainer(
        model, variables, train_loader, val_loader, config=cfg,
        save_checkpoints=False, log_dir=log_dir,
    )
    trainer.train()
    files = os.listdir(log_dir)
    assert files, "log_dir is empty — no scalars written"
    if trainer.scalar_writer.backend == "jsonl":
        import json

        lines = [
            json.loads(line)
            for line in open(os.path.join(log_dir, "scalars.jsonl"))
        ]
        tags = {rec["tag"] for rec in lines}
        assert {"train_loss", "val_top1", "lr"} <= tags
    else:
        assert any(f.startswith("events.out.tfevents") for f in files)


def test_scalar_writer_jsonl_fallback(tmp_path, monkeypatch):
    """With no tensorboard library importable, ScalarWriter degrades to a
    JSONL scalar log rather than failing."""
    import importlib
    import json

    real_import_module = importlib.import_module

    def no_tb(name, *a, **k):
        if name.startswith(("tensorboardX", "torch")):
            raise ImportError(name)
        return real_import_module(name, *a, **k)

    monkeypatch.setattr(importlib, "import_module", no_tb)
    from vqa_tpu.utils.tb import ScalarWriter

    w = ScalarWriter(str(tmp_path))
    assert w.backend == "jsonl"
    w.log_scalars(0, {"train_loss": 1.5})
    w.log_scalars(1, {"train_loss": 1.25})
    w.close()
    recs = [
        json.loads(line) for line in open(tmp_path / "scalars.jsonl")
    ]
    assert recs == [
        {"step": 0, "tag": "train_loss", "value": 1.5},
        {"step": 1, "tag": "train_loss", "value": 1.25},
    ]


def test_trainer_saves_latest_even_without_improvement(tmp_path, monkeypatch):
    """A run whose validation accuracy never improves must still write a
    'latest' checkpoint on completion (regression: a 2-epoch run on 1000
    random answers saved nothing, then the history write crashed on the
    missing directory)."""
    train_loader, val_loader = create_demo_loaders(
        batch_size=4, eval_batch_size=4, num_samples=16,
        image_size=32, max_question_length=6, vocab_size=50, num_answers=8,
    )
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    cfg = TrainingConfig(num_epochs=1, batch_size=4, warmup_epochs=0)
    ckpt_dir = str(tmp_path / "fresh" / "ckpts")  # does not exist yet
    trainer = Trainer(
        model, variables, train_loader, val_loader, config=cfg,
        checkpoint_dir=ckpt_dir,
    )
    monkeypatch.setattr(
        trainer, "validate",
        lambda: {"val_loss": 9.9, "val_top1": 0.0, "val_top5": 0.0},
    )
    logger = trainer.train()
    assert os.path.exists(os.path.join(ckpt_dir, "latest.meta.json"))
    # history save must create missing parent directories too
    logger.save(os.path.join(ckpt_dir, "sub", "training_history.json"))
    assert os.path.exists(os.path.join(ckpt_dir, "sub", "training_history.json"))


def test_checkpoint_save_resume(tmp_path):
    train_loader, val_loader = create_demo_loaders(
        batch_size=4, eval_batch_size=4, num_samples=16,
        image_size=32, max_question_length=6, vocab_size=50, num_answers=8,
    )
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    cfg = TrainingConfig(num_epochs=1, batch_size=4, warmup_epochs=0)
    trainer = Trainer(
        model, variables, train_loader, val_loader, config=cfg,
        checkpoint_dir=str(tmp_path),
    )
    trainer.best_val_accuracy = -1.0  # force improvement & save
    trainer.train()
    assert os.path.exists(os.path.join(tmp_path, "latest.meta.json"))

    # resume into a fresh trainer
    trainer2 = Trainer(
        model, init_vqa_model(model, jax.random.PRNGKey(7)),
        train_loader, val_loader, config=cfg, checkpoint_dir=str(tmp_path),
    )
    trainer2.resume("latest")
    assert trainer2.start_epoch == 1
    # params actually restored (differ from fresh init)
    p_new = jax.tree_util.tree_leaves(trainer2.state.params)[0]
    p_old = jax.tree_util.tree_leaves(trainer.state.params)[0]
    np.testing.assert_allclose(np.asarray(p_new), np.asarray(p_old))


def test_evaluator_on_demo(tmp_path):
    from vqa_tpu.training.evaluate import Evaluator

    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    ds = DemoVQADataset(
        num_samples=10, image_size=32, max_question_length=6,
        vocab_size=50, num_answers=8,
    )
    loader = BatchLoader(ds, 4, drop_last=False)
    ev = Evaluator(model, variables)
    results = ev.evaluate(loader)
    assert results["num_samples"] == 10  # padded final batch NOT counted
    assert 0.0 <= results["top1_accuracy"] <= 1.0
    assert results["top1_accuracy"] <= results["top5_accuracy"]
    report = ev.generate_report(results)
    assert "top-1 accuracy" in report


def test_evaluator_reports_vqa_soft_accuracy_on_real_dataset(tmp_path):
    """annotator answers ride through dataset → loader → Evaluator and the
    official soft accuracy min(1, agreement/3) appears in the results
    (regression: the key was never emitted, so the metric was dead code)."""
    import json as _json

    from PIL import Image

    from vqa_tpu.data.dataset import BatchLoader, VQADataset

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    questions, annotations = [], []
    for i in range(4):
        Image.new("RGB", (48, 48), (i * 40, 80, 120)).save(
            img_dir / f"{i:012d}.jpg"
        )
        questions.append(
            {"question_id": i, "image_id": i, "question": "what color is it"}
        )
        annotations.append(
            {
                "question_id": i,
                "multiple_choice_answer": "red" if i % 2 else "blue",
                "question_type": "what color",
                "answers": [{"answer": "red" if i % 2 else "blue"}] * 7
                + [{"answer": "green"}] * 3,
            }
        )
    qp, ap = tmp_path / "q.json", tmp_path / "a.json"
    qp.write_text(_json.dumps({"questions": questions}))
    ap.write_text(_json.dumps({"annotations": annotations}))

    ds = VQADataset(
        str(qp), str(ap), str(img_dir), num_answers=8,
        max_question_length=6, vocab_size=50, is_training=False,
        image_size=32,
    )
    assert len(ds) == 4
    sample = ds[0]
    assert sample["annotator_answers"].shape == (10,)

    loader = BatchLoader(ds, batch_size=4, drop_last=False)
    batch = next(iter(loader))
    assert batch["annotator_answers"].shape == (4, 10)

    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    from vqa_tpu.training.evaluate import Evaluator

    results = Evaluator(model, variables, ds.answer_vocab).evaluate(loader)
    assert "vqa_soft_accuracy" in results
    assert 0.0 <= results["vqa_soft_accuracy"] <= 1.0
    assert results["per_type_accuracy"].keys() == {"what color"}


def test_sigterm_saves_interrupted_checkpoint(tmp_path):
    """SIGTERM mid-training routes through the KeyboardInterrupt save path
    (checkpoint-on-signal; the reference only catches Ctrl-C)."""
    import os as _os
    import signal as _signal

    train_loader, val_loader = create_demo_loaders(
        batch_size=4, eval_batch_size=4, num_samples=16,
        image_size=32, max_question_length=6, vocab_size=50, num_answers=8,
    )
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    trainer = Trainer(
        model, variables, train_loader, val_loader,
        config=TrainingConfig(num_epochs=3, batch_size=4, warmup_epochs=0),
        checkpoint_dir=str(tmp_path),
    )

    def validate_and_sigterm():
        _os.kill(_os.getpid(), _signal.SIGTERM)
        return {"val_loss": 1.0, "val_top1": 0.0, "val_top5": 0.0}

    trainer.validate = validate_and_sigterm
    before = _signal.getsignal(_signal.SIGTERM)
    with pytest.raises(KeyboardInterrupt):
        trainer.train()
    assert os.path.exists(os.path.join(tmp_path, "interrupted.meta.json"))
    # the previous SIGTERM handler is restored on exit
    assert _signal.getsignal(_signal.SIGTERM) == before


def test_evaluate_cli_synthetic_reuses_split_and_embeds_samples(tmp_path):
    """End-to-end train→evaluate CLI on synthetic data: the evaluator
    rebuilds the EXACT val split persisted in the checkpoint sidecar (no
    train/val overlap regardless of --max-samples), decodes with the
    synthetic vocab, and embeds sample_predictions in the results artifact
    (reference: training/evaluate.py:386-389)."""
    import json

    from vqa_tpu.training import evaluate as eval_mod
    from vqa_tpu.training import train as train_mod

    train_mod.main([
        "--synthetic", "--tiny", "--epochs", "1", "--batch-size", "8",
        "--subset-size", "64", "--patience", "1",
        "--checkpoint-dir", str(tmp_path),
    ])
    # default --max-samples is 5000: without the persisted split spec the
    # evaluator would rebuild with num_samples=5000 and score trained-on
    # scenes; with it, the val split is exactly indices [51, 64)
    results = eval_mod.main([
        "--checkpoint-dir", str(tmp_path), "--synthetic", "--batch-size", "8",
    ])
    assert results["num_samples"] == 64 - int(64 * 0.8)
    sp = results["sample_predictions"]
    assert sp
    assert {"target", "top5_indices", "top5_probs", "question",
            "target_answer", "top5_answers"} <= set(sp[0])
    # decoded labels come from the synthetic answer set
    from vqa_tpu.data.synthetic import ANSWERS
    assert sp[0]["target_answer"] in ANSWERS
    with open(os.path.join(tmp_path, "evaluation_results.json")) as f:
        artifact = json.load(f)
    assert "sample_predictions" in artifact
    # reference-compatible alias keys (reference: training/evaluate.py:130-137)
    # so reference tooling reads our artifact unchanged
    assert artifact["accuracy"] == artifact["top1_accuracy"]
    assert artifact["accuracy_top5"] == artifact["top5_accuracy"]
    assert artifact["total_samples"] == artifact["num_samples"]
    # common_errors entries carry the reference's exact schema: ints under
    # *_idx, decoded strings under predicted/target
    assert len(artifact["common_errors"]) == len(artifact["error_pairs"])
    for ref_e, ours_e in zip(artifact["common_errors"],
                             artifact["error_pairs"]):
        assert ref_e["predicted_idx"] == ours_e["predicted"]
        assert ref_e["target_idx"] == ours_e["target"]
        assert ref_e["count"] == ours_e["count"]
        assert ref_e["predicted"] == ours_e["predicted_answer"]
        assert isinstance(ref_e["predicted"], str)
    assert artifact["correct"] == round(
        artifact["accuracy"] * artifact["total_samples"]
    )


def test_shard_for_process_disjoint_equal_cover():
    """Per-host sample shards are disjoint, equal-length (lockstep), and
    cover the index set up to the dropped remainder."""
    from vqa_tpu.data.dataset import BatchLoader, shard_for_process

    ds = DemoVQADataset(num_samples=21, image_size=32,
                        max_question_length=6, vocab_size=50, num_answers=8)
    loader = BatchLoader(ds, 4, shuffle=True, drop_last=True, seed=7)
    shards = [shard_for_process(loader, pi, 4) for pi in range(4)]
    sets = [set(s.indices.tolist()) for s in shards]
    assert all(len(s.indices) == 21 // 4 for s in shards)
    union = set().union(*sets)
    assert len(union) == sum(len(x) for x in sets)  # disjoint
    assert union <= set(range(21))
    # single-process is a no-op (same object)
    assert shard_for_process(loader, 0, 1) is loader
    # batches carry the device-reducible pad mask
    batch = next(iter(shards[0]))
    assert batch["valid_mask"].tolist() == [1, 1, 1, 1]


def test_grad_accum_matches_single_microbatch():
    """With dropout off and the batch = one microbatch duplicated, a
    grad_accum=2 step must produce the same loss, 2x the correct-counts, and
    the same updated params as a plain step on the single microbatch (each
    microbatch normalizes with its own BN stats, so duplicated microbatches
    yield identical per-micro grads whose average equals either one)."""
    kw = dict(TINY, dropout=0.0, answer_dropout=0.0)
    model = create_vqa_model(**kw)
    variables = init_vqa_model(model, jax.random.PRNGKey(0), batch_size=4)
    cfg = TrainingConfig(learning_rate=1e-3, warmup_epochs=0, num_epochs=1)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)

    def fresh_state():
        return TrainState.create(
            apply_fn=model.apply,
            params=jax.tree_util.tree_map(jnp.copy, variables["params"]),
            tx=tx,
            batch_stats=jax.tree_util.tree_map(
                jnp.copy, variables["batch_stats"]
            ),
        )

    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(4, 50, size=(4, 6)), jnp.int32)
    mask = jnp.ones((4, 6), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 8, size=(4,)), jnp.int32)
    key = jax.random.PRNGKey(3)

    plain = make_train_step(model, grad_accum=1)
    accum = make_train_step(model, grad_accum=2)

    s1, m1 = plain(fresh_state(), images, ids, mask, labels, key)
    dup = lambda x: jnp.concatenate([x, x], axis=0)
    s2, m2 = accum(
        fresh_state(), dup(images), dup(ids), dup(mask), dup(labels), key
    )

    np.testing.assert_allclose(
        float(m2["loss"]), float(m1["loss"]), atol=1e-5
    )
    assert int(m2["correct1"]) == 2 * int(m1["correct1"])
    assert int(m2["correct5"]) == 2 * int(m1["correct5"])
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_grad_accum_trainer_end_to_end(tmp_path):
    """--grad-accum path through the Trainer: one demo epoch, finite loss."""
    train_loader, val_loader = create_demo_loaders(
        batch_size=4, eval_batch_size=4, num_samples=8,
        image_size=32, max_question_length=6, vocab_size=50, num_answers=8,
    )
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    cfg = TrainingConfig(
        num_epochs=1, batch_size=4, warmup_epochs=0, learning_rate=1e-3,
        grad_accum=2,
    )
    trainer = Trainer(
        model, variables, train_loader, val_loader, config=cfg,
        checkpoint_dir=str(tmp_path), save_checkpoints=False,
    )
    logger = trainer.train()
    assert np.isfinite(logger.history["train_loss"][0])


def test_grad_accum_rejects_indivisible_batch():
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0), batch_size=4)
    cfg = TrainingConfig(learning_rate=1e-3, warmup_epochs=0, num_epochs=1)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables["batch_stats"],
    )
    step = make_train_step(model, grad_accum=3)
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="not divisible"):
        step(
            state,
            jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32),
            jnp.ones((4, 6), jnp.int32),
            jnp.ones((4, 6), jnp.int32),
            jnp.zeros((4,), jnp.int32),
            jax.random.PRNGKey(0),
        )


def test_batch_loader_num_workers_matches_inline():
    """Threaded sample fetch yields byte-identical batches to inline for a
    deterministic dataset, and the augmented (shared-RNG) path is
    thread-safe (spawned child generators, no corrupted state)."""
    from vqa_tpu.data.synthetic import SyntheticVQADataset

    ds = SyntheticVQADataset(
        num_samples=16, image_size=32, max_question_length=6,
        is_training=False, seed=3,
    )
    inline = BatchLoader(ds, 4, shuffle=False, drop_last=False)
    threaded = BatchLoader(ds, 4, shuffle=False, drop_last=False,
                           num_workers=4)
    for a, b in zip(inline, threaded):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["token_ids"], b["token_ids"])
        np.testing.assert_array_equal(a["answer"], b["answer"])

    aug_ds = SyntheticVQADataset(
        num_samples=16, image_size=32, max_question_length=6,
        is_training=True, seed=3,
    )
    loader = BatchLoader(aug_ds, 4, shuffle=True, drop_last=True,
                         num_workers=4)
    for batch in loader:
        assert batch["image"].shape == (4, 32, 32, 3)
        assert np.isfinite(batch["image"]).all()


def test_set_epoch_shuffle_is_resume_invariant():
    """Shuffle order derives from (seed, epoch): a loader that jumps
    straight to epoch 1 via set_epoch yields exactly the order an
    uninterrupted run saw in its second pass — resumed runs replay the
    same data order. Auto-advance still reshuffles between bare passes."""
    ds = DemoVQADataset(num_samples=16, image_size=32, max_question_length=6,
                        vocab_size=50, num_answers=8)

    def order(loader):
        return [b["answer"].tolist() for b in loader]

    uninterrupted = BatchLoader(ds, 4, shuffle=True, seed=5)
    epoch0 = order(uninterrupted)
    epoch1 = order(uninterrupted)
    assert epoch0 != epoch1  # reshuffles across passes

    resumed = BatchLoader(ds, 4, shuffle=True, seed=5)
    resumed.set_epoch(1)
    assert order(resumed) == epoch1

    fresh = BatchLoader(ds, 4, shuffle=True, seed=5)
    assert order(fresh) == epoch0


def test_label_smoothing_loss():
    """smoothing=0 reproduces the plain CE exactly; smoothing>0 changes the
    loss and still trains (finite loss, params update)."""
    model, state = _tiny_setup()
    rng = np.random.default_rng(9)
    args = (
        jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32),
        jnp.asarray(rng.integers(4, 50, size=(4, 6)), jnp.int32),
        jnp.ones((4, 6), jnp.int32),
        jnp.asarray(rng.integers(0, 8, size=(4,)), jnp.int32),
        jax.random.PRNGKey(0),
    )

    def fresh():
        import copy
        return jax.tree_util.tree_map(jnp.copy, state)

    plain = make_train_step(model)
    zero = make_train_step(model, label_smoothing=0.0)
    smooth = make_train_step(model, label_smoothing=0.1)

    _, m_plain = plain(fresh(), *args)
    _, m_zero = zero(fresh(), *args)
    s_sm, m_smooth = smooth(fresh(), *args)
    np.testing.assert_allclose(float(m_zero["loss"]), float(m_plain["loss"]),
                               rtol=1e-6)
    assert abs(float(m_smooth["loss"]) - float(m_plain["loss"])) > 1e-4
    assert np.isfinite(float(m_smooth["loss"]))


def test_warmup_zero_is_cosine_only_schedule():
    """--warmup-epochs 0 reproduces the reference's ACTUAL schedule: pure
    cosine annealing from lr to min_lr with no warmup ramp (the reference
    declares warmup_epochs=2 in config but never implements warmup —
    reference: utils/config.py:190 vs training/train.py:139-143)."""
    lr, min_lr, epochs, spe = 1e-4, 1e-6, 30, 10
    cfg = TrainingConfig(
        learning_rate=lr, min_lr=min_lr, warmup_epochs=0,
        num_epochs=epochs, batch_size=4,
    )
    _, sched = make_optimizer(cfg, steps_per_epoch=spe)
    total = epochs * spe
    # no warmup: step 0 is already at the peak lr
    assert float(sched(0)) == pytest.approx(lr, rel=1e-6)
    # closed form: min + 0.5*(peak-min)*(1+cos(pi*t/T))
    for t in (1, total // 4, total // 2, 3 * total // 4, total - 1, total):
        expected = min_lr + 0.5 * (lr - min_lr) * (1 + np.cos(np.pi * t / total))
        assert float(sched(t)) == pytest.approx(float(expected), rel=1e-5), t
    # and with warmup ON the first step must NOT be at peak
    cfg_w = TrainingConfig(
        learning_rate=lr, min_lr=min_lr, warmup_epochs=2,
        num_epochs=epochs, batch_size=4,
    )
    _, sched_w = make_optimizer(cfg_w, steps_per_epoch=spe)
    assert float(sched_w(0)) < lr * 0.5
    assert float(sched_w(2 * spe)) == pytest.approx(lr, rel=1e-5)


def test_epoch_granularity_schedule_matches_torch_cosine_annealing():
    """lr_schedule_granularity='epoch' reproduces the reference's scheduler
    EXACTLY: torch CosineAnnealingLR(T_max=epochs, eta_min) stepped once per
    epoch, so the LR is piecewise-constant within an epoch (reference:
    training/train.py:139-143, scheduler.step() at :352). Checked against
    torch itself, not a hand-derived formula."""
    import torch

    lr, min_lr, epochs, spe = 1e-4, 1e-6, 8, 25
    cfg = TrainingConfig(
        learning_rate=lr, min_lr=min_lr, warmup_epochs=0,
        num_epochs=epochs, batch_size=4,
        lr_schedule_granularity="epoch",
    )
    _, sched = make_optimizer(cfg, steps_per_epoch=spe)

    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    torch_sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=epochs, eta_min=min_lr
    )
    for epoch in range(epochs):
        expected = opt.param_groups[0]["lr"]
        # constant across the whole epoch: first, middle, and last step
        for step in (epoch * spe, epoch * spe + spe // 2,
                     (epoch + 1) * spe - 1):
            assert float(sched(step)) == pytest.approx(expected, rel=1e-6), (
                epoch, step)
        torch_sched.step()

    # the default step granularity is strictly below the epoch-held LR
    # mid-epoch (it is already partway down the cosine) — the measured
    # cause of the head-to-head train-loss offset (docs/HEAD_TO_HEAD.md)
    cfg_step = TrainingConfig(
        learning_rate=lr, min_lr=min_lr, warmup_epochs=0,
        num_epochs=epochs, batch_size=4,
    )
    _, sched_step = make_optimizer(cfg_step, steps_per_epoch=spe)
    mid = 3 * spe + spe // 2
    assert float(sched_step(mid)) < float(sched(mid))

    with pytest.raises(ValueError, match="granularity"):
        make_optimizer(
            TrainingConfig(lr_schedule_granularity="minute"), 10
        )


def test_warmup_and_min_lr_cli_flags_thread_to_config():
    """The train CLI exposes --warmup-epochs/--min-lr so the reference's
    exact schedule is reachable from the command line."""
    from vqa_tpu.training.train import parse_args

    args = parse_args(
        ["--warmup-epochs", "0", "--min-lr", "5e-7", "--demo", "--tiny"]
    )
    assert args.warmup_epochs == 0
    assert args.min_lr == 5e-7
    # default: both None → TrainingConfig defaults apply unchanged
    args2 = parse_args(["--demo", "--tiny"])
    assert args2.warmup_epochs is None and args2.min_lr is None


def test_validate_reports_per_type_accuracy():
    """Trainer.validate feeds per-question-type accuracy (the reference's
    VQAAccuracy plumbing that no caller ever feeds — reference:
    utils/metrics.py:97-105); the on-device scatter-add totals must agree
    with the overall top-1."""
    import tempfile

    train_loader, val_loader = create_demo_loaders(
        batch_size=4, eval_batch_size=4, num_samples=16,
        image_size=TINY["image_size"],
        max_question_length=6,
        vocab_size=TINY["vocab_size"], num_answers=TINY["num_answers"],
    )
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0), batch_size=4)
    trainer = Trainer(
        model, variables, train_loader, val_loader,
        config=TrainingConfig(num_epochs=1, batch_size=4, warmup_epochs=0),
        save_checkpoints=False,
    )
    m = trainer.validate()
    assert "val_per_type" in m
    # demo data has exactly one question type; its accuracy IS the top-1
    assert set(m["val_per_type"]) == {"demo"}
    assert m["val_per_type"]["demo"] == pytest.approx(m["val_top1"], abs=1e-6)
    # and the flattened key lands in the training history
    logger = trainer.train()
    assert "val_per_type/demo" in logger.history


def test_evaluator_sample_predictions_single_pass():
    """After evaluate(), sample_predictions decodes from the cached logits
    — ZERO extra forward passes (VERDICT r2 weak #4: the eval CLI used to
    run the whole forward pass twice)."""
    from vqa_tpu.training.evaluate import Evaluator

    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0), batch_size=4)
    ds = DemoVQADataset(
        num_samples=10, image_size=TINY["image_size"],
        max_question_length=6, vocab_size=TINY["vocab_size"],
        num_answers=TINY["num_answers"],
    )
    loader = BatchLoader(ds, 4, drop_last=False)
    ev = Evaluator(model, variables)
    results = ev.evaluate(loader)

    def boom(*a, **k):
        raise AssertionError("sample_predictions re-ran the forward pass")

    ev.eval_step = boom
    samples = ev.sample_predictions(loader, tokenizer=None, num=20)
    # 10 samples exist; the (complete) cache serves all of them
    assert len(samples) == 10
    # decoded top-5 must be consistent with the evaluated accuracy
    top1 = np.mean(
        [s["top5_indices"][0] == s["target"] for s in samples]
    )
    assert top1 == pytest.approx(results["top1_accuracy"], abs=1e-6)


def test_remat_matches_plain_step():
    """remat='stages'/'full' (jax.checkpoint over the loss) must reproduce
    the plain GRADIENTS: remat changes WHAT is saved for the backward, not
    the math. (Post-AdamW params are not compared — near-zero grad elements
    update at ~lr·sign(g), amplifying last-bit recompute differences.)
    Exercises the checkpoint_name tags in models/cnn_backbone.py."""
    import optax

    kw = dict(TINY, dropout=0.0, answer_dropout=0.0)
    model = create_vqa_model(**kw)
    variables = init_vqa_model(model, jax.random.PRNGKey(0), batch_size=4)
    cfg = TrainingConfig(learning_rate=1e-3, warmup_epochs=0, num_epochs=1)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)

    def fresh_state():
        return TrainState.create(
            apply_fn=model.apply,
            params=jax.tree_util.tree_map(jnp.copy, variables["params"]),
            tx=tx,
            batch_stats=jax.tree_util.tree_map(
                jnp.copy, variables["batch_stats"]
            ),
        )

    rng = np.random.default_rng(11)
    images = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(4, 50, size=(4, 6)), jnp.int32)
    mask = jnp.ones((4, 6), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 8, size=(4,)), jnp.int32)
    key = jax.random.PRNGKey(3)

    def loss_of(params):
        (logits, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images, ids, mask, train=True, mutable=["batch_stats"],
            rngs={"dropout": key},
        )
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    cp = jax.checkpoint_policies
    l0, g0 = jax.jit(jax.value_and_grad(loss_of))(variables["params"])
    for policy in (cp.nothing_saveable, cp.save_only_these_names(
            "resnet_stem", "resnet_stage1", "resnet_stage2",
            "resnet_stage3", "resnet_stage4")):
        fn = jax.checkpoint(loss_of, policy=policy)
        l1, g1 = jax.jit(jax.value_and_grad(fn))(variables["params"])
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            # recompute reorders f32 accumulations, so individual elements
            # drift ~1e-5 regardless of their own magnitude — compare
            # against each leaf's grad SCALE, not elementwise
            a, b = np.asarray(a), np.asarray(b)
            scale = float(np.abs(a).max())
            assert float(np.abs(a - b).max()) <= max(1e-4 * scale, 1e-6)

    # the shipped step under remat: runs, finite loss, same top-1 counts
    s0, m0 = make_train_step(model)(
        fresh_state(), images, ids, mask, labels, key)
    for mode, accum in (("stages", 1), ("full", 1), ("stages", 2)):
        s1, m1 = make_train_step(model, grad_accum=accum, remat=mode)(
            fresh_state(), images, ids, mask, labels, key)
        assert np.isfinite(float(m1["loss"]))
        if accum == 1:
            np.testing.assert_allclose(
                float(m1["loss"]), float(m0["loss"]), rtol=1e-6)
            assert int(m1["correct1"]) == int(m0["correct1"])

    with pytest.raises(ValueError, match="remat"):
        make_train_step(model, remat="bogus")(
            fresh_state(), images, ids, mask, labels, key)


def test_remat_cli_flag_threads_to_config():
    from vqa_tpu.training.train import parse_args

    args = parse_args(["--remat", "stages", "--demo", "--tiny"])
    assert args.remat == "stages"
    assert parse_args(["--demo", "--tiny"]).remat == "none"


def test_stem_s2d_cli_flag_builds_s2d_model():
    """--stem-s2d threads to the model factory (execution plan only: same
    param tree, same math — numerical equivalence is proven in
    test_models.test_stem_s2d_exact_equivalence)."""
    from vqa_tpu.models import create_vqa_model
    from vqa_tpu.training.train import parse_args

    args = parse_args(["--stem-s2d", "--demo", "--tiny"])
    assert args.stem_s2d is True
    assert parse_args(["--demo", "--tiny"]).stem_s2d is False
    model = create_vqa_model(stem_s2d=args.stem_s2d)
    assert model.stem_s2d is True


def test_unknown_question_type_goes_to_overflow_bucket():
    """A sample whose question_type is NOT in the loader's construction-time
    type vocab must map to the sentinel id len(vocab), and the val_step
    scatter must DROP it (num_types+1 rows, last sliced off) instead of
    silently crediting the alphabetically-first type."""
    from vqa_tpu.data.dataset import BatchLoader, DemoVQADataset
    from vqa_tpu.training.train import make_val_step

    class StrayTypeDataset(DemoVQADataset):
        # sample 0 reports a type the type_vocab() snapshot doesn't contain
        def __getitem__(self, idx):
            s = super().__getitem__(idx)
            if idx == 0:
                s["question_type"] = "never-seen"
            return s

    ds = StrayTypeDataset(
        num_samples=4, image_size=TINY["image_size"],
        max_question_length=6, vocab_size=TINY["vocab_size"],
        num_answers=TINY["num_answers"],
    )
    loader = BatchLoader(ds, batch_size=4, shuffle=False, drop_last=False)
    batch = next(iter(loader))
    n_types = len(loader.type_vocab)
    assert batch["type_ids"][0] == n_types          # sentinel
    assert set(batch["type_ids"][1:]) <= set(range(n_types))

    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0), batch_size=4)
    val_step = make_val_step(model, num_types=n_types)
    out = val_step(
        variables["params"], variables["batch_stats"],
        jnp.asarray(batch["image"]), jnp.asarray(batch["token_ids"]),
        jnp.asarray(batch["attention_mask"]), jnp.asarray(batch["answer"]),
        jnp.asarray(batch["valid_mask"]), jnp.asarray(batch["type_ids"]),
    )
    assert out["type_total"].shape == (n_types,)
    # the unknown-type row was dropped: per-type totals cover 3 samples,
    # the overall count all 4
    assert float(jnp.sum(out["type_total"])) == 3.0
    assert float(out["n"]) == 4.0


def test_sample_predictions_cache_is_loader_keyed(tmp_path):
    """sample_predictions must NOT serve cached samples from a different
    loader than the one passed in (the cache is evaluate()-coupled)."""
    from vqa_tpu.data import AnswerVocabulary
    from vqa_tpu.training.evaluate import Evaluator

    train_loader, val_loader = create_demo_loaders(
        batch_size=4, eval_batch_size=4, num_samples=16,
        image_size=TINY["image_size"], max_question_length=6,
        vocab_size=TINY["vocab_size"], num_answers=TINY["num_answers"],
    )
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0), batch_size=4)
    vocab = AnswerVocabulary(num_answers=TINY["num_answers"])
    vocab.build_from_qa_pairs([{"answer": "yes"}])
    ev = Evaluator(model, variables, vocab)
    ev.evaluate(val_loader)
    assert ev._sample_cache is not None
    # same loader: served from cache (no recompute) — spy via cache id
    s_val = ev.sample_predictions(val_loader, None, num=4)
    assert len(s_val) == 4
    # different loader (deterministic order): must fall back to running
    # forwards on THAT loader, not serve the val cache
    from vqa_tpu.data.dataset import BatchLoader, DemoVQADataset

    other = BatchLoader(
        DemoVQADataset(
            num_samples=8, image_size=TINY["image_size"],
            max_question_length=6, vocab_size=TINY["vocab_size"],
            num_answers=TINY["num_answers"], seed=123,
        ),
        batch_size=4, shuffle=False, drop_last=False,
    )
    s_other = ev.sample_predictions(other, None, num=4)
    assert len(s_other) == 4
    # targets must come from the other loader's first batch, not the cache
    first = next(iter(other))
    expect = [int(a) for a in first["answer"][:4]]
    assert [s["target"] for s in s_other] == expect
