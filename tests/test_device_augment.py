"""On-device augmentation tests (data.preprocess.device_augment).

The host has one CPU core, so train-time augmentation runs as device ops
inside XLA; these check shapes/ranges, determinism, per-sample variation,
numerical agreement of the jitter math with the host path, and the
Trainer's uint8-batch detection end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.data.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    device_augment,
)

S = 32  # small crop size for fast tests; source is S+32


def _batch(b=4, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 256, size=(b, S + 32, S + 32, 3), dtype=np.uint8)
    )


def test_shapes_dtype_and_range():
    out = device_augment(_batch(), jax.random.PRNGKey(0), image_size=S)
    assert out.shape == (4, S, S, 3)
    assert out.dtype == jnp.float32
    # exact post-normalize bounds of clipped [0,1] pixels
    lo = float(((0.0 - IMAGENET_MEAN) / IMAGENET_STD).min()) - 1e-5
    hi = float(((1.0 - IMAGENET_MEAN) / IMAGENET_STD).max()) + 1e-5
    assert float(out.min()) >= lo and float(out.max()) <= hi
    assert np.isfinite(np.asarray(out)).all()


def test_deterministic_per_key_and_varies_across_keys():
    x = _batch()
    a = device_augment(x, jax.random.PRNGKey(1), image_size=S)
    b = device_augment(x, jax.random.PRNGKey(1), image_size=S)
    c = device_augment(x, jax.random.PRNGKey(2), image_size=S)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.max(jnp.abs(a - c))) > 1e-3


def test_samples_get_independent_params():
    # identical images in the batch must come out different (independent
    # crops/flips/jitters per sample)
    one = _batch(1)
    x = jnp.tile(one, (4, 1, 1, 1))
    out = np.asarray(device_augment(x, jax.random.PRNGKey(3), image_size=S))
    diffs = [
        np.abs(out[i] - out[j]).max()
        for i in range(4)
        for j in range(i + 1, 4)
    ]
    assert max(diffs) > 1e-3


def test_jitter_math_matches_host_formulas():
    """Disable crop/flip randomness by construction (uniform image patch is
    crop/flip invariant) and check the b/c/s/h chain against the host
    formulas applied with the exact params the device drew."""
    b = 3
    rng = np.random.default_rng(7)
    # spatially constant per-sample colors: crop and flip are no-ops
    colors = rng.uniform(0.2, 0.8, size=(b, 1, 1, 3)).astype(np.float32)
    xu8 = np.broadcast_to(
        (colors * 255).astype(np.uint8), (b, S + 32, S + 32, 3)
    )
    key = jax.random.PRNGKey(11)
    out = np.asarray(
        device_augment(jnp.asarray(xu8), key, image_size=S)
    )

    # replicate the device's parameter draws
    k_crop, k_flip, k_b, k_c, k_s, k_h = jax.random.split(key, 6)
    fb = np.asarray(jax.random.uniform(k_b, (b, 1, 1, 1), minval=0.8, maxval=1.2))
    fc = np.asarray(jax.random.uniform(k_c, (b, 1, 1, 1), minval=0.8, maxval=1.2))
    fs = np.asarray(jax.random.uniform(k_s, (b, 1, 1, 1), minval=0.8, maxval=1.2))
    theta = np.asarray(
        jax.random.uniform(k_h, (b,), minval=-0.1, maxval=0.1)
    ) * (2 * np.pi)

    from vqa_tpu.data.preprocess import _RGB2YIQ, _YIQ2RGB

    x = (xu8[:, :S, :S].astype(np.float32) / 255.0)
    x = x * fb
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    x = (x - mean) * fc + mean
    gray = x @ np.array([0.299, 0.587, 0.114], np.float32)
    x = (x - gray[..., None]) * fs + gray[..., None]
    for i in range(b):
        c, s = np.cos(theta[i]), np.sin(theta[i])
        rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
        yiq = x[i] @ _RGB2YIQ.T
        x[i] = (yiq @ rot.T) @ _YIQ2RGB.T
    x = np.clip(x, 0.0, 1.0)
    expect = (x - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out, expect, atol=2e-5)


def test_trainer_uint8_batch_path():
    """Trainer detects uint8 train batches and augments on-device."""
    from vqa_tpu.models import create_vqa_model, init_vqa_model
    from vqa_tpu.training.train import Trainer
    from vqa_tpu.utils.config import TrainingConfig

    kw = dict(
        vocab_size=20, num_answers=7, embed_dim=16,
        num_transformer_layers=1, num_attention_heads=2, ffn_hidden_dim=32,
        max_question_length=6, image_size=S, base_channels=8,
        stage_channels=(8, 16, 32, 64), feature_spatial_size=1,
    )
    model = create_vqa_model(**kw)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)

    def batches(dtype):
        for _ in range(2):
            img = (
                rng.integers(0, 256, size=(8, S + 32, S + 32, 3), dtype=np.uint8)
                if dtype == np.uint8
                else rng.normal(size=(8, S, S, 3)).astype(np.float32)
            )
            yield {
                "image": img,
                "token_ids": rng.integers(4, 20, size=(8, 6)).astype(np.int32),
                "attention_mask": np.ones((8, 6), np.int32),
                "answer": rng.integers(0, 7, size=(8,)).astype(np.int32),
                "valid": 8,
            }

    class L:
        def __init__(self, dtype):
            self.dtype = dtype
            self.batch_size = 8

        def __iter__(self):
            return batches(self.dtype)

        def __len__(self):
            return 2

    cfg = TrainingConfig(num_epochs=1, warmup_epochs=0)
    trainer = Trainer(
        model, variables, L(np.uint8), L(np.float32),
        config=cfg, save_checkpoints=False,
    )
    metrics = trainer.train_epoch(0)
    assert np.isfinite(metrics["train_loss"])


def test_real_loaders_device_aug_end_to_end(tmp_path):
    """create_train_val_loaders(device_augment=True) yields uint8 (S+32)
    train batches, f32 val batches, and the Trainer trains on them."""
    import json as _json

    from PIL import Image

    from vqa_tpu.data.dataset import create_train_val_loaders
    from vqa_tpu.models import create_vqa_model, init_vqa_model
    from vqa_tpu.training.train import Trainer
    from vqa_tpu.utils.config import TrainingConfig

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    questions, annotations = [], []
    for i in range(10):
        Image.new("RGB", (50, 40), (i * 20, 100, 150)).save(
            img_dir / f"{i:012d}.jpg"
        )
        questions.append(
            {"question_id": i, "image_id": i, "question": "what color is it"}
        )
        annotations.append(
            {"question_id": i, "multiple_choice_answer": "red" if i % 2 else "blue"}
        )
    qp, ap = tmp_path / "q.json", tmp_path / "a.json"
    qp.write_text(_json.dumps({"questions": questions}))
    ap.write_text(_json.dumps({"annotations": annotations}))

    train_loader, val_loader, tok, vocab = create_train_val_loaders(
        str(qp), str(ap), str(img_dir),
        batch_size=4, eval_batch_size=2, max_question_length=6,
        vocab_size=50, num_answers=8, image_size=S, device_augment=True,
    )
    tb = next(iter(train_loader))
    assert tb["image"].dtype == np.uint8
    assert tb["image"].shape[1:] == (S + 32, S + 32, 3)
    vb = next(iter(val_loader))
    assert vb["image"].dtype == np.float32
    assert vb["image"].shape[1:] == (S, S, 3)

    kw = dict(
        vocab_size=tok.vocab_size, num_answers=8, embed_dim=16,
        num_transformer_layers=1, num_attention_heads=2, ffn_hidden_dim=32,
        max_question_length=6, image_size=S, base_channels=8,
        stage_channels=(8, 16, 32, 64), feature_spatial_size=1,
    )
    model = create_vqa_model(**kw)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    trainer = Trainer(
        model, variables, train_loader, val_loader,
        config=TrainingConfig(num_epochs=1, warmup_epochs=0, batch_size=4),
        save_checkpoints=False,
    )
    m = trainer.train_epoch(0)
    assert np.isfinite(m["train_loss"])


def test_real_loaders_num_workers_threaded_decode(tmp_path):
    """create_train_val_loaders(num_workers=2): the real-data path decodes
    JPEG samples on the thread pool and val batches stay byte-identical to
    inline (the val transform is deterministic)."""
    import json as _json

    from PIL import Image

    from vqa_tpu.data.dataset import create_train_val_loaders

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    questions, annotations = [], []
    for i in range(10):
        Image.new("RGB", (50, 40), (i * 20, 100, 150)).save(
            img_dir / f"{i:012d}.jpg"
        )
        questions.append(
            {"question_id": i, "image_id": i, "question": "what color is it"}
        )
        annotations.append(
            {"question_id": i, "multiple_choice_answer": "red" if i % 2 else "blue"}
        )
    qp, ap = tmp_path / "q.json", tmp_path / "a.json"
    qp.write_text(_json.dumps({"questions": questions}))
    ap.write_text(_json.dumps({"annotations": annotations}))

    kwargs = dict(
        batch_size=4, eval_batch_size=2, max_question_length=6,
        vocab_size=50, num_answers=8, image_size=S,
    )
    _, val_inline, _, _ = create_train_val_loaders(
        str(qp), str(ap), str(img_dir), **kwargs
    )
    train_thr, val_thr, _, _ = create_train_val_loaders(
        str(qp), str(ap), str(img_dir), num_workers=2, **kwargs
    )
    assert val_thr.num_workers == 2
    for a, b in zip(val_inline, val_thr):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["answer"], b["answer"])
    # augmented train path: threaded fetch runs and yields sane batches
    tb = next(iter(train_thr))
    assert tb["image"].shape == (4, S, S, 3)
    assert np.isfinite(tb["image"]).all()
