"""Cross-attention (text queries image tokens) in Flax.

TPU-native re-design of the reference cross-attention stack
(reference: models/cross_attention.py:41-365): biasless Q/K/V/O projections
with Xavier init, √(d/H) scaling, −1e9 masked fill, pre-norm on query AND
key/value, residuals, optional 4d FFN, stacked N=2 with per-layer weights.

The attention core can optionally run as a fused Pallas TPU kernel
(vqa_tpu/ops/cross_attention_kernel.py): QKᵀ → softmax → ·V resident in
VMEM — at L_q=20, L_kv=49 the whole score matrix is a single tile, so the
fused path saves the HBM round-trips XLA would otherwise spend on the
intermediate [B,H,L_q,L_kv] tensors.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1e9

xavier_uniform = nn.initializers.xavier_uniform()


class CrossAttention(nn.Module):
    """Attention core: Q from text, K/V from image
    (reference: models/cross_attention.py:41-205)."""

    embed_dim: int
    num_heads: int = 8
    dropout: float = 0.1
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key_value: jnp.ndarray,
        query_mask: Optional[jnp.ndarray] = None,
        key_value_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert self.embed_dim % self.num_heads == 0
        b, lq, _ = query.shape
        lkv = key_value.shape[1]
        h, dh = self.num_heads, self.embed_dim // self.num_heads
        scale = math.sqrt(dh)

        def dense(name):
            return nn.Dense(
                self.embed_dim, use_bias=False, kernel_init=xavier_uniform,
                dtype=self.dtype, name=name,
            )

        q = dense("W_q")(query).reshape(b, lq, h, dh).transpose(0, 2, 1, 3)
        k = dense("W_k")(key_value).reshape(b, lkv, h, dh).transpose(0, 2, 1, 3)
        v = dense("W_v")(key_value).reshape(b, lkv, h, dh).transpose(0, 2, 1, 3)

        if self.use_pallas and not train and key_value_mask is None:
            # fused VMEM-resident attention (inference path; dropout-free)
            from vqa_tpu.ops.cross_attention_kernel import fused_cross_attention

            ctx, weights = fused_cross_attention(q, k, v, scale)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / scale
            if key_value_mask is not None:
                scores = jnp.where(
                    key_value_mask[:, None, None, :] == 0, NEG_INF, scores
                )
            weights = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
                self.dtype
            )
            weights = nn.Dropout(self.dropout, deterministic=not train)(weights)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", weights, v)

        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, lq, self.embed_dim)
        out = dense("W_o")(ctx)
        return out, weights


class MultiHeadCrossAttention(nn.Module):
    """Pre-norm (query and kv) + residual + optional FFN (hidden 4d)
    (reference: models/cross_attention.py:208-299)."""

    embed_dim: int
    num_heads: int = 8
    dropout: float = 0.1
    use_ffn: bool = True
    ffn_hidden_dim: Optional[int] = None
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key_value: jnp.ndarray,
        query_mask: Optional[jnp.ndarray] = None,
        key_value_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        normed_q = nn.LayerNorm(dtype=self.dtype, name="norm_query")(query)
        normed_kv = nn.LayerNorm(dtype=self.dtype, name="norm_kv")(key_value)
        attended, attn_weights = CrossAttention(
            self.embed_dim, self.num_heads, self.dropout,
            use_pallas=self.use_pallas, dtype=self.dtype,
            name="cross_attention",
        )(normed_q, normed_kv, query_mask, key_value_mask, train)
        query = query + nn.Dropout(self.dropout, deterministic=not train)(attended)

        if self.use_ffn:
            hidden = self.ffn_hidden_dim or 4 * self.embed_dim
            normed = nn.LayerNorm(dtype=self.dtype, name="norm_ffn")(query)
            ff = nn.Dense(hidden, dtype=self.dtype, name="ffn_fc1")(normed)
            ff = nn.relu(ff)
            ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
            ff = nn.Dense(self.embed_dim, dtype=self.dtype, name="ffn_fc2")(ff)
            ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
            query = query + ff
        return query, attn_weights


class StackedCrossAttention(nn.Module):
    """N cross-attention blocks, query refined layer-to-layer
    (reference: models/cross_attention.py:302-365)."""

    embed_dim: int
    num_heads: int = 8
    num_layers: int = 2
    dropout: float = 0.1
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key_value: jnp.ndarray,
        query_mask: Optional[jnp.ndarray] = None,
        key_value_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        all_weights = []
        for i in range(self.num_layers):
            query, w = MultiHeadCrossAttention(
                self.embed_dim, self.num_heads, self.dropout,
                use_pallas=self.use_pallas, dtype=self.dtype,
                name=f"layer{i}",
            )(query, key_value, query_mask, key_value_mask, train)
            all_weights.append(w)
        return query, all_weights
