"""JAX → PyTorch checkpoint exporter (compat/torch_export.py).

Round-trip consistency with the importer, strict-load + logits parity
against the actual reference model, and the checkpoint-dir export path.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_tpu.compat.torch_export import (
    flax_to_torch_state_dict,
    sinusoidal_pe,
)
from vqa_tpu.compat.torch_import import convert_torch_state_dict
from vqa_tpu.models import create_vqa_model, init_vqa_model
from vqa_tpu.utils.config import ModelConfig

KEY = jax.random.PRNGKey(0)

TINY = dict(
    vocab_size=20,
    num_answers=7,
    embed_dim=16,
    num_transformer_layers=2,
    num_attention_heads=2,
    ffn_hidden_dim=32,
    max_question_length=6,
    image_size=64,
    base_channels=8,
    stage_channels=(8, 16, 32, 64),
    feature_spatial_size=2,
)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def test_export_import_roundtrip_tiny():
    """export(import(x)) == x for every param and batch stat, torch-free."""
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, KEY)
    sd = flax_to_torch_state_dict(variables, model.config)

    assert "text_encoder.positional_encoding.pe" in sd
    assert sd["text_encoder.positional_encoding.pe"].shape == (1, 6, 16)
    assert "image_encoder.stem.1.num_batches_tracked" in sd

    back = convert_torch_state_dict(sd)
    for coll in ("params", "batch_stats"):
        want = _flatten(variables[coll])
        got = _flatten(back[coll])
        assert set(want) == set(got), (
            set(want) ^ set(got)
        )
        for path in want:
            np.testing.assert_array_equal(
                want[path], got[path], err_msg="/".join(path)
            )


def test_export_respects_ablations():
    """No SE/spatial/gate keys when the config disables them (the reference
    model's modules are conditional the same way)."""
    model = create_vqa_model(**TINY, use_attention=False, use_gating=False)
    variables = init_vqa_model(model, KEY)
    sd = flax_to_torch_state_dict(variables, model.config)
    assert not any(".se." in k or ".spatial." in k or ".gate." in k for k in sd)


def test_sinusoidal_pe_matches_reference_formula():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from models.text_encoder import PositionalEncoding

    ref_pe = PositionalEncoding(16, max_length=6).pe.numpy()
    np.testing.assert_allclose(sinusoidal_pe(6, 16), ref_pe, atol=1e-6)


def test_reference_strict_load_and_logit_parity():
    """The gold test: a freshly initialized JAX model exports to a
    state_dict the reference VQAModel loads with strict=True, and both
    frameworks produce the same logits on the same input."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    import models.vqa_model as ref_vqa

    kw = dict(
        vocab_size=60,
        embed_dim=32,
        num_answers=10,
        num_transformer_layers=2,
        num_attention_heads=4,
        ffn_hidden_dim=64,
        max_question_length=8,
        num_cross_layers=2,
    )
    jm = create_vqa_model(**kw)
    variables = init_vqa_model(jm, KEY)

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in flax_to_torch_state_dict(variables, jm.config).items()
    }
    tm = ref_vqa.VQAModel(**kw)
    tm.load_state_dict(sd, strict=True)
    tm.eval()

    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
    ids = rng.integers(4, 60, size=(2, 8)).astype(np.int64)
    ids[:, 0] = 2
    ids[1, 4:] = 0
    mask = (ids != 0).astype(np.int64)

    with torch.no_grad():
        logits_ref, _ = tm(
            torch.from_numpy(imgs),
            torch.from_numpy(ids),
            torch.from_numpy(mask),
        )

    from vqa_tpu.models import forward_logits

    logits = forward_logits(
        jm,
        variables,
        jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))),
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)),
    )
    err = np.max(np.abs(np.asarray(logits) - logits_ref.numpy()))
    print(f"export parity max abs err: {err:.2e}")
    assert err < 1e-3


def test_export_checkpoint_dir(tmp_path):
    """Orbax checkpoint dir → reference-schema .pth (loadable by torch)."""
    torch = pytest.importorskip("torch")
    from vqa_tpu.compat.torch_export import export_checkpoint_dir
    from vqa_tpu.training.checkpoint import save_checkpoint

    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, KEY)
    save_checkpoint(
        str(tmp_path),
        "best_model",
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        model.config,
        {"epoch": 3, "best_val_accuracy": 0.5},
    )
    out = str(tmp_path / "exported.pth")
    export_checkpoint_dir(str(tmp_path), out, which="best_model")

    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 3
    assert ckpt["best_val_accuracy"] == 0.5
    assert ckpt["config"]["vocab_size"] == 20
    assert ckpt["config"]["num_answers"] == 7
    assert "image_encoder.stem.0.weight" in ckpt["model_state_dict"]
    # conv layout really is OIHW on the torch side
    w = ckpt["model_state_dict"]["image_encoder.stem.0.weight"]
    assert tuple(w.shape) == (8, 3, 7, 7)


def test_import_cli_and_model_only_resume(tmp_path):
    """Full migration circle: a reference-schema .pth (here produced by the
    exporter) converts via ``python -m vqa_tpu.compat.torch_import`` into a
    checkpoint directory, serves through load_model_for_inference, and
    resumes training with a fresh optimizer (model_only sidecar flag)."""
    torch = pytest.importorskip("torch")
    from vqa_tpu.compat.torch_export import save_torch_checkpoint
    from vqa_tpu.compat.torch_import import import_checkpoint_to_dir
    from vqa_tpu.training.checkpoint import (
        load_checkpoint_meta,
        load_model_for_inference,
    )

    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, KEY)
    pth = str(tmp_path / "ref.pth")
    save_torch_checkpoint(
        variables, model.config, pth, epoch=2, best_val_accuracy=0.25
    )

    out_dir = str(tmp_path / "converted")
    import_checkpoint_to_dir(pth, out_dir)

    meta = load_checkpoint_meta(out_dir, "latest")
    assert meta["model_only"] is True
    assert meta["epoch"] == 2

    m2, v2 = load_model_for_inference(out_dir, name="best_model")
    got = _flatten(v2["params"])
    want = _flatten(variables["params"])
    assert set(got) == set(want)
    for path in want:
        np.testing.assert_allclose(
            got[path], want[path], atol=1e-6, err_msg="/".join(path)
        )

    # resume: fresh optimizer, start_epoch from the .pth's epoch
    from vqa_tpu.data.dataset import create_demo_loaders
    from vqa_tpu.training.train import Trainer
    from vqa_tpu.utils.config import TrainingConfig

    tl, vl = create_demo_loaders(
        batch_size=4, eval_batch_size=4, num_samples=8,
        image_size=TINY["image_size"],
        max_question_length=TINY["max_question_length"],
        vocab_size=TINY["vocab_size"], num_answers=TINY["num_answers"],
    )
    trainer = Trainer(
        model, init_vqa_model(model, KEY), tl, vl,
        config=TrainingConfig(num_epochs=4, batch_size=4, warmup_epochs=0),
        checkpoint_dir=out_dir, save_checkpoints=False,
    )
    trainer.resume("latest")
    assert trainer.start_epoch == 3
    assert trainer.best_val_accuracy == 0.25
    # weights really landed
    np.testing.assert_allclose(
        _flatten(trainer.state.params)[("answer_head", "fc1", "kernel")],
        want[("answer_head", "fc1", "kernel")],
        atol=1e-6,
    )
    logger = trainer.train()
    assert len(logger.history["train_loss"]) == 1  # epoch 3 of 4
