"""Model shape/semantics unit tests (formalizing the reference's per-module
__main__ smoke tests, SURVEY.md §4 item (a)), on tiny shapes for CPU speed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_tpu.models import (
    AnswerHead,
    AttentionWrapper,
    CBAMBlock,
    CrossAttention,
    CustomResNet,
    GatingMechanism,
    ImageFeatureProjector,
    MultiHeadSelfAttention,
    MultimodalFusion,
    SEAttention,
    SelfAttention2D,
    SpatialAttention,
    StackedCrossAttention,
    TransformerTextEncoder,
    count_parameters,
    create_vqa_model,
    init_vqa_model,
)

KEY = jax.random.PRNGKey(0)


def test_se_attention_shape_and_range():
    x = jax.random.normal(KEY, (2, 8, 8, 32))
    mod = SEAttention(channels=32, reduction=16)
    v = mod.init(KEY, x)
    y = mod.apply(v, x)
    assert y.shape == x.shape
    # scale in (0,1): |y| <= |x|
    assert float(jnp.max(jnp.abs(y) - jnp.abs(x))) <= 1e-6


def test_spatial_attention_shape():
    x = jax.random.normal(KEY, (2, 8, 8, 16))
    mod = SpatialAttention(kernel_size=7)
    v = mod.init(KEY, x)
    y = mod.apply(v, x)
    assert y.shape == x.shape


def test_cbam_and_selfattn2d_api_complete():
    x = jax.random.normal(KEY, (2, 4, 4, 16))
    cbam = CBAMBlock(channels=16)
    y = cbam.apply(cbam.init(KEY, x), x)
    assert y.shape == x.shape
    sa = SelfAttention2D(channels=16, reduction=8)
    y2 = sa.apply(sa.init(KEY, x), x)
    assert y2.shape == x.shape
    # gamma starts at 0 -> identity
    np.testing.assert_allclose(np.asarray(y2), np.asarray(x), atol=1e-6)


def test_attention_wrapper_ablation():
    x = jax.random.normal(KEY, (1, 4, 4, 8))
    off = AttentionWrapper(channels=8, use_se=False, use_spatial=False)
    v = off.init(KEY, x)
    assert not jax.tree_util.tree_leaves(v)  # no params at all
    y = off.apply(v, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_cnn_backbone_shapes():
    """Downsampling stack: input 64 -> 64/32=2 spatial (reference asserts
    [B,512,7,7] for 224; same /32 ratio, models/cnn_backbone.py:440-463)."""
    model = CustomResNet(base_channels=8)
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    v = jax.jit(lambda: model.init(KEY, x, train=False))()
    y = model.apply(v, x, train=False)
    assert y.shape == (2, 2, 2, 64)  # 8*8 channels, 64/32 spatial


def test_cnn_batchnorm_train_updates_stats():
    model = CustomResNet(base_channels=8)
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    v = model.init(KEY, x, train=False)
    y, mutated = model.apply(v, x, train=True, mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(v["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )


def test_text_encoder_shapes_and_masked_pooling():
    enc = TransformerTextEncoder(
        vocab_size=50, embed_dim=32, num_layers=2, num_heads=4,
        ffn_hidden_dim=64, max_length=10,
    )
    ids = jnp.array([[2, 5, 6, 3, 0, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    mask = (ids != 0).astype(jnp.int32)
    v = enc.init(KEY, ids, mask)
    seq, pooled = enc.apply(v, ids, mask)
    assert seq.shape == (1, 10, 32)
    assert pooled.shape == (1, 32)
    # pooled must equal mean over unmasked positions only
    expected = np.asarray(seq)[0, :4].mean(axis=0)
    np.testing.assert_allclose(np.asarray(pooled)[0], expected, rtol=1e-5)


def test_mhsa_rows_sum_to_one_under_mask():
    """Row-stochasticity check (reference: models/cross_attention.py:400-401)."""
    mod = MultiHeadSelfAttention(embed_dim=16, num_heads=4)
    x = jax.random.normal(KEY, (2, 6, 16))
    mask = jnp.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.int32)
    v = mod.init(KEY, x, mask)
    _, w = mod.apply(v, x, mask)
    sums = np.asarray(jnp.sum(w, axis=-1))
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)
    # masked keys get ~zero weight
    assert float(jnp.max(w[0, :, :, 3:])) < 1e-6


def test_cross_attention_shapes_and_stochastic_rows():
    mod = CrossAttention(embed_dim=16, num_heads=4)
    q = jax.random.normal(KEY, (2, 5, 16))
    kv = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 16))
    v = mod.init(KEY, q, kv)
    out, w = mod.apply(v, q, kv)
    assert out.shape == (2, 5, 16)
    assert w.shape == (2, 4, 5, 9)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)


def test_stacked_cross_attention_collects_weights():
    mod = StackedCrossAttention(embed_dim=16, num_heads=2, num_layers=3)
    q = jax.random.normal(KEY, (1, 4, 16))
    kv = jax.random.normal(KEY, (1, 6, 16))
    v = mod.init(KEY, q, kv)
    out, ws = mod.apply(v, q, kv)
    assert out.shape == (1, 4, 16)
    assert len(ws) == 3


def test_image_projector_and_gating():
    proj = ImageFeatureProjector(in_channels=32, embed_dim=16, spatial_size=3)
    x = jax.random.normal(KEY, (2, 3, 3, 32))
    v = proj.init(KEY, x)
    y = proj.apply(v, x)
    assert y.shape == (2, 9, 16)
    assert v["params"]["position_embedding"].shape == (1, 9, 16)

    gate = GatingMechanism(embed_dim=16)
    a = jax.random.normal(KEY, (2, 16))
    b = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    gv = gate.init(KEY, a, b)
    fused = gate.apply(gv, a, b)
    assert fused.shape == (2, 16)
    # output is a convex combination of a and b elementwise
    lo = np.minimum(np.asarray(a), np.asarray(b))
    hi = np.maximum(np.asarray(a), np.asarray(b))
    f = np.asarray(fused)
    assert np.all(f >= lo - 1e-5) and np.all(f <= hi + 1e-5)


def test_fusion_output_and_aux():
    fusion = MultimodalFusion(
        image_channels=32, image_spatial_size=2, embed_dim=16,
        num_heads=2, num_cross_layers=2,
    )
    img = jax.random.normal(KEY, (2, 2, 2, 32))
    txt = jax.random.normal(KEY, (2, 5, 16))
    mask = jnp.ones((2, 5), jnp.int32)
    v = fusion.init(KEY, img, txt, mask)
    fused, aux = fusion.apply(v, img, txt, mask)
    assert fused.shape == (2, 16)
    assert len(aux["cross_attention_weights"]) == 2
    assert aux["image_projected"].shape == (2, 4, 16)


def test_answer_head_shape():
    head = AnswerHead(input_dim=16, hidden_dim=32, num_answers=11)
    x = jax.random.normal(KEY, (3, 16))
    v = head.init(KEY, x)
    y = head.apply(v, x)
    assert y.shape == (3, 11)


def _tiny_model(**kw):
    return create_vqa_model(
        vocab_size=50,
        num_answers=7,
        embed_dim=16,
        num_transformer_layers=1,
        num_attention_heads=2,
        ffn_hidden_dim=32,
        max_question_length=6,
        image_size=64,
        base_channels=8,
        stage_channels=(8, 16, 32, 64),
        feature_spatial_size=2,
        **kw,
    )


def test_full_model_forward_tiny():
    model = _tiny_model()
    v = init_vqa_model(model, KEY, batch_size=2)
    imgs = jax.random.normal(KEY, (2, 64, 64, 3))
    ids = jnp.ones((2, 6), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)
    logits, aux = model.apply(v, imgs, ids, mask, train=False, return_aux=True)
    assert logits.shape == (2, 7)
    assert logits.dtype == jnp.float32
    assert aux["image_features"].shape == (2, 2, 2, 64)
    assert np.isfinite(np.asarray(logits)).all()


def test_ablation_changes_param_count():
    full = _tiny_model()
    noattn = _tiny_model(use_attention=False)
    v_full = init_vqa_model(full, KEY)
    v_no = init_vqa_model(noattn, KEY)
    assert (
        count_parameters(v_full)["image_encoder"]
        > count_parameters(v_no)["image_encoder"]
    )


def test_no_spatial_ablation_param_count():
    """The reference README's middle ablation row disables only spatial
    attention (reference: README.md:349-353). Spatial blocks are tiny
    (98 params/site), so: full > no-spatial > no-attention."""
    full = _tiny_model()
    nospatial = _tiny_model(use_spatial_attention=False)
    noattn = _tiny_model(use_attention=False)
    n_full = count_parameters(init_vqa_model(full, KEY))["image_encoder"]
    n_nosp = count_parameters(init_vqa_model(nospatial, KEY))["image_encoder"]
    n_noat = count_parameters(init_vqa_model(noattn, KEY))["image_encoder"]
    assert n_full > n_nosp > n_noat
    assert not nospatial.config.use_spatial_attention
    assert nospatial.config.use_se_attention


def test_dropout_is_deterministic_in_eval():
    model = _tiny_model()
    v = init_vqa_model(model, KEY)
    imgs = jax.random.normal(KEY, (1, 64, 64, 3))
    ids = jnp.ones((1, 6), jnp.int32)
    l1, _ = model.apply(v, imgs, ids, None, train=False)
    l2, _ = model.apply(v, imgs, ids, None, train=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_train_mode_runs_with_dropout_rng():
    model = _tiny_model()
    v = init_vqa_model(model, KEY)
    imgs = jax.random.normal(KEY, (2, 64, 64, 3))
    ids = jnp.ones((2, 6), jnp.int32)
    logits, _ = model.apply(
        v, imgs, ids, None, train=True,
        rngs={"dropout": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )[0]
    assert logits.shape == (2, 7)


@pytest.mark.slow
def test_full_size_param_count_matches_reference():
    """Reference measured 19,310,316 params (SURVEY.md §0)."""
    model = create_vqa_model()
    v = init_vqa_model(model, KEY)
    c = count_parameters(v)
    assert c["total"] == 19_310_316
    assert c["image_encoder"] == 11_220_228
    assert c["text_encoder"] == 5_715_456
    assert c["fusion"] == 1_854_720
    assert c["answer_head"] == 519_912


def test_stem_s2d_exact_equivalence():
    """Space-to-depth stem is the same math as the 7x7/2 conv: identical
    params, near-identical outputs (f32 summation-order tolerance only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqa_tpu.models.cnn_backbone import StemConv

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    )
    std = StemConv(16, s2d=False)
    s2d = StemConv(16, s2d=True)
    variables = std.init(rng, x)
    y0 = jax.jit(std.apply)(variables, x)
    y1 = jax.jit(s2d.apply)(variables, x)  # same param tree
    assert y0.shape == y1.shape == (2, 16, 16, 16)
    err = float(jnp.max(jnp.abs(y0 - y1)))
    print(f"s2d stem max abs err: {err:.2e}")
    assert err < 1e-5


def test_top_level_api_exports():
    """`from vqa_tpu import X` works for the public API (lazy loaded)."""
    import vqa_tpu

    for name in (
        "VQAModel", "create_vqa_model", "Trainer", "Evaluator",
        "VQAInference", "VQAServer", "MicroBatcher", "Tokenizer",
        "AnswerVocabulary", "VQADataset", "create_mesh",
        "load_torch_checkpoint", "ModelConfig",
    ):
        assert getattr(vqa_tpu, name) is not None
    import pytest as _pytest

    with _pytest.raises(AttributeError):
        vqa_tpu.not_a_thing


def test_stage_channels_config_is_honored():
    """ModelConfig.stage_channels drives the backbone widths (regression:
    the backbone used to derive widths from base_channels only, leaving
    stage_channels as dead config)."""
    import jax

    from vqa_tpu.models import count_parameters, create_vqa_model, init_vqa_model

    tiny = dict(
        vocab_size=50, embed_dim=16, num_answers=8,
        num_transformer_layers=1, num_attention_heads=2, ffn_hidden_dim=32,
        max_question_length=6, image_size=32, base_channels=8,
        feature_spatial_size=1,
    )
    m1 = create_vqa_model(**tiny, stage_channels=(8, 16, 32, 64))
    m2 = create_vqa_model(**tiny, stage_channels=(16, 16, 32, 64))
    n1 = count_parameters(init_vqa_model(m1, jax.random.PRNGKey(0)))["total"]
    n2 = count_parameters(init_vqa_model(m2, jax.random.PRNGKey(0)))["total"]
    assert n2 > n1
    # widths not equal to base*(1,2,4,8) still produce the right feature dim
    import numpy as np
    logits, _ = jax.jit(
        lambda v, im, i, k: m2.apply(v, im, i, k, train=False)
    )(
        init_vqa_model(m2, jax.random.PRNGKey(0)),
        np.zeros((2, 32, 32, 3), np.float32),
        np.ones((2, 6), np.int32),
        np.ones((2, 6), np.int32),
    )
    assert logits.shape == (2, 8)


def test_base_channels_alone_derives_stage_widths():
    """Customizing base_channels without stage_channels derives the
    (1,2,4,8) ramp — neither knob is silently dead config."""
    from vqa_tpu.utils.config import ModelConfig

    assert ModelConfig(base_channels=32).stage_channels == (32, 64, 128, 256)
    assert ModelConfig().stage_channels == (64, 128, 256, 512)
    # the factory rederives when overriding base_channels alone
    from vqa_tpu.models import create_vqa_model

    m = create_vqa_model(base_channels=16)
    assert m.config.stage_channels == (16, 32, 64, 128)
    # explicit stage widths still win
    m2 = create_vqa_model(base_channels=16, stage_channels=(16, 16, 32, 64))
    assert m2.config.stage_channels == (16, 16, 32, 64)
