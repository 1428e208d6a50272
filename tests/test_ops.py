"""Pallas kernel parity tests (interpreter mode on CPU) against XLA oracles."""

import jax
import jax.numpy as jnp
import numpy as np

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
