"""Numerical parity against the PyTorch reference implementation.

Builds the reference model from /root/reference (torch CPU), imports its
weights through vqa_tpu.compat.torch_import, and checks logits agree to
< 1e-3 max abs error (BASELINE.json fidelity target; expected ~1e-5 in f32).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

from vqa_tpu.compat.torch_import import convert_torch_state_dict  # noqa: E402
from vqa_tpu.models import create_vqa_model, forward_logits  # noqa: E402

ATOL = 1e-3  # max abs logit error (BASELINE.json fidelity target)


def _ref_modules():
    import importlib

    for m in ("models.attention_modules", "models.cnn_backbone",
              "models.text_encoder", "models.cross_attention",
              "models.fusion", "models.vqa_model"):
        importlib.import_module(m)
    import models.vqa_model as ref_vqa
    import models.cnn_backbone as ref_cnn

    return ref_vqa, ref_cnn


@pytest.fixture(scope="module")
def ref():
    return _ref_modules()


def test_cnn_backbone_parity(ref):
    """CNN path: convs, BN (eval running stats), SE, spatial, maxpool."""
    _, ref_cnn = ref
    torch.manual_seed(0)
    tm = ref_cnn.CustomResNet()
    tm.eval()

    x = np.random.default_rng(0).normal(size=(2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        y_ref = tm(torch.from_numpy(x)).numpy()  # [B,512,7,7]

    from vqa_tpu.models import CustomResNet

    variables = convert_torch_state_dict(
        {f"image_encoder.{k}": v for k, v in tm.state_dict().items()}
    )
    variables = {
        "params": variables["params"]["image_encoder"],
        "batch_stats": variables["batch_stats"]["image_encoder"],
    }
    jm = CustomResNet()
    y = jax.jit(lambda v, a: jm.apply(v, a, train=False))(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    y_nchw = np.transpose(np.asarray(y), (0, 3, 1, 2))
    err = np.max(np.abs(y_nchw - y_ref))
    print(f"CNN max abs err: {err:.2e}")
    assert err < ATOL


def test_full_model_parity(ref):
    """pixels+ids → 1000-way logits, end to end (small text config)."""
    ref_vqa, _ = ref
    torch.manual_seed(1)
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
    tm = ref_vqa.VQAModel(**kw)
    tm.eval()

    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
    ids = rng.integers(4, 60, size=(2, 8)).astype(np.int64)
    ids[:, 0] = 2
    ids[0, 5:] = 0
    mask = (ids != 0).astype(np.int64)

    with torch.no_grad():
        logits_ref, _ = tm(
            torch.from_numpy(imgs),
            torch.from_numpy(ids),
            torch.from_numpy(mask),
        )
    logits_ref = logits_ref.numpy()

    variables = convert_torch_state_dict(tm.state_dict())
    jm = create_vqa_model(**kw)
    logits = forward_logits(
        jm,
        variables,
        jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))),
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)),
    )
    err = np.max(np.abs(np.asarray(logits) - logits_ref))
    print(f"full-model logits max abs err: {err:.2e}")
    assert err < ATOL


def test_converter_rejects_unknown_keys():
    with pytest.raises((ValueError, KeyError)):
        convert_torch_state_dict({"bogus.module.weight": np.zeros((2, 2))})


@pytest.mark.slow
def test_full_size_model_parity(ref):
    """Default config (vocab 10k, d=256, 1000 answers) end-to-end parity."""
    ref_vqa, _ = ref
    torch.manual_seed(2)
    tm = ref_vqa.VQAModel()
    tm.eval()
    rng = np.random.default_rng(2)
    imgs = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    ids = rng.integers(4, 10000, size=(1, 20)).astype(np.int64)
    ids[0, 0] = 2
    ids[0, 15:] = 0
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        logits_ref, _ = tm(
            torch.from_numpy(imgs), torch.from_numpy(ids), torch.from_numpy(mask)
        )
    variables = convert_torch_state_dict(tm.state_dict())
    jm = create_vqa_model()
    logits = forward_logits(
        jm, variables,
        jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))),
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)),
    )
    err = np.max(np.abs(np.asarray(logits) - logits_ref.numpy()))
    print(f"full-size logits max abs err: {err:.2e}")
    assert err < ATOL


def test_no_attention_ablation_parity(ref):
    """--no-attention ablation (BASELINE config #4): reference model built
    with use_attention=False imports and matches end to end."""
    ref_vqa, _ = ref
    torch.manual_seed(4)
    kw = dict(
        vocab_size=60, embed_dim=32, num_answers=10,
        num_transformer_layers=1, num_attention_heads=4,
        ffn_hidden_dim=64, max_question_length=8, num_cross_layers=1,
    )
    tm = ref_vqa.VQAModel(
        use_se_attention=False, use_spatial_attention=False, **kw
    )
    tm.eval()
    rng = np.random.default_rng(4)
    imgs = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
    ids = rng.integers(4, 60, size=(2, 8)).astype(np.int64)
    mask = np.ones((2, 8), np.int64)
    with torch.no_grad():
        logits_ref, _ = tm(
            torch.from_numpy(imgs), torch.from_numpy(ids), torch.from_numpy(mask)
        )
    variables = convert_torch_state_dict(tm.state_dict())
    jm = create_vqa_model(use_attention=False, **kw)
    logits = forward_logits(
        jm, variables,
        jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))),
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)),
    )
    err = np.max(np.abs(np.asarray(logits) - logits_ref.numpy()))
    print(f"no-attention ablation logits max abs err: {err:.2e}")
    assert err < ATOL
