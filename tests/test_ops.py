"""Pallas kernel parity tests (interpreter mode on CPU) against XLA oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_tpu.ops import (
    fused_cross_attention,
    fused_se,
    xla_cross_attention,
    xla_se,
)


def test_fused_cross_attention_matches_xla():
    key = jax.random.PRNGKey(0)
    b, h, lq, lkv, dh = 1, 2, 20, 49, 32
    q = jax.random.normal(key, (b, h, lq, dh), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, lkv, dh), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, lkv, dh), jnp.float32)
    scale = float(np.sqrt(dh))
    ctx_p, w_p = fused_cross_attention(q, k, v, scale, interpret=True)
    ctx_x, w_x = xla_cross_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(ctx_p), np.asarray(ctx_x),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_x),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w_p.sum(-1)), 1.0, atol=1e-5)


def test_fused_se_matches_xla():
    key = jax.random.PRNGKey(0)
    b, hh, ww, c, r = 2, 7, 7, 64, 4
    x = jax.random.normal(key, (b, hh, ww, c), jnp.float32)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (c, c // r)) * 0.1
    w2 = jax.random.normal(jax.random.PRNGKey(2), (c // r, c)) * 0.1
    y_p = fused_se(x, w1, w2, interpret=True)
    y_x = xla_se(x, w1, w2)
    # sum·(1/HW) vs mean reduction order → ~1e-4 sigmoid-amplified wobble
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               atol=1e-3, rtol=1e-3)


def test_fused_cross_attention_in_model_path():
    """The flag-gated model path must agree with the default path."""
    from vqa_tpu.models.cross_attention import CrossAttention

    q = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 16))
    kv = jax.random.normal(jax.random.PRNGKey(4), (2, 9, 16))
    base = CrossAttention(embed_dim=16, num_heads=4, use_pallas=False)
    v = base.init(jax.random.PRNGKey(0), q, kv)
    out_x, w_x = base.apply(v, q, kv)
    pall = CrossAttention(embed_dim=16, num_heads=4, use_pallas=True)
    out_p, w_p = pall.apply(v, q, kv)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-5, rtol=1e-5)


def test_stem_weight_packing_and_phase_planes():
    """Fast checks of the fused-stem prep: tap-packed weights match direct
    indexing, and the polyphase planes reconstruct the padded input."""
    from vqa_tpu.ops.stem_kernel import _phase_planes, pack_stem_weights

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32))
    wk = pack_stem_weights(w)
    assert wk.shape == (7, 32, 64)
    for kh, kw, c in [(0, 0, 0), (3, 4, 1), (6, 6, 2)]:
        np.testing.assert_array_equal(np.asarray(wk[kh, kw * 3 + c]),
                                      np.asarray(w[kh, kw, c]))
    np.testing.assert_array_equal(np.asarray(wk[:, 21:]), 0.0)

    x = jnp.asarray(rng.normal(size=(1, 224, 224, 3)).astype(np.float32))
    xp = _phase_planes(x)
    assert xp.shape == (1, 12, 128, 128)
    xpad = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    for pr, pc, c in [(0, 0, 0), (1, 0, 2), (1, 1, 1)]:
        plane = xp[0, pr * 6 + pc * 3 + c, :115, :115]
        np.testing.assert_array_equal(np.asarray(plane),
                                      np.asarray(xpad[0, pr::2, pc::2, c]))


@pytest.mark.slow
def test_fused_stem_matches_xla():
    """Full-geometry interpret-mode parity (minutes on CPU: 14 row blocks
    x 49 taps through the Pallas interpreter)."""
    from vqa_tpu.ops import fused_stem, xla_stem

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 224, 224, 3)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(7, 7, 3, 64)) * 0.05).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64).astype(np.float32))
    bias = jnp.asarray((rng.normal(size=64) * 0.1).astype(np.float32))
    out = fused_stem(x, w, scale, bias, interpret=True)
    ref = xla_stem(x, w, scale, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_stem_variable_tree_matches_xla_path():
    """The fused-stem execution plan must declare an IDENTICAL variable
    tree (names, shapes, dtypes) so checkpoints and the torch importer are
    unaffected; verified structurally via eval_shape (no compute)."""
    from vqa_tpu.models import create_vqa_model

    def shapes(model):
        cfg = model.config
        img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        ids = jnp.zeros((1, cfg.max_question_length), jnp.int32)
        mask = jnp.ones((1, cfg.max_question_length), jnp.int32)
        tree = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              img, ids, mask)
        return jax.tree.map(lambda x: (x.shape, x.dtype), tree)

    base = shapes(create_vqa_model(stem_fused=False))
    fused = shapes(create_vqa_model(stem_fused=True))
    assert base == fused
