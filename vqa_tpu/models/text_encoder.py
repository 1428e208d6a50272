"""Transformer question encoder in Flax (pre-norm, hand-rolled MHA).

TPU-native re-design of the reference text encoder
(reference: models/text_encoder.py:33-607): 4 pre-norm layers, 8 heads,
d=256, FFN 1024, sinusoidal positional encoding, embeddings scaled by √d
with a zeroed PAD row, masked-mean pooled output.

TPU-first choices:
- the sinusoidal table is computed at trace time with numpy and folded into
  the XLA program as a constant (no buffer state to carry);
- Q/K/V/O are single fused [D,D] matmuls per projection — at L=20, D=256
  the whole encoder is a handful of MXU tiles; attention masking uses a
  large-negative fill (−1e9) instead of −inf so fully-masked rows can never
  NaN (the reference's −inf fill at models/text_encoder.py:244 would;
  its cross-attention already uses −1e9 at models/cross_attention.py:182);
- heads are reshaped, never looped.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def sinusoidal_position_encoding(max_length: int, embed_dim: int) -> np.ndarray:
    """Precompute the [max_length, embed_dim] sinusoidal table
    (reference math: models/text_encoder.py:74-93)."""
    pe = np.zeros((max_length, embed_dim), dtype=np.float32)
    position = np.arange(max_length, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, embed_dim, 2, dtype=np.float32)
        * (-math.log(10000.0) / embed_dim)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term[: (embed_dim // 2)]) if embed_dim % 2 else np.cos(position * div_term)
    return pe


class PositionalEncoding(nn.Module):
    """Add the sinusoidal table, then dropout
    (reference: models/text_encoder.py:33-114)."""

    embed_dim: int
    max_length: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        seq_len = x.shape[1]
        pe = jnp.asarray(
            sinusoidal_position_encoding(self.max_length, self.embed_dim),
            dtype=self.dtype,
        )
        x = x + pe[None, :seq_len, :]
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class MultiHeadSelfAttention(nn.Module):
    """Hand-rolled multi-head self-attention with biasless W_q/W_k/W_v/W_o
    and √(d/H) scaling (reference: models/text_encoder.py:117-265)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert self.embed_dim % self.num_heads == 0
        b, L, _ = x.shape
        h, dh = self.num_heads, self.embed_dim // self.num_heads
        scale = math.sqrt(dh)

        def proj(name):
            return nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                            name=name)(x)

        q = proj("W_q").reshape(b, L, h, dh).transpose(0, 2, 1, 3)
        k = proj("W_k").reshape(b, L, h, dh).transpose(0, 2, 1, 3)
        v = proj("W_v").reshape(b, L, h, dh).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / scale
        if attention_mask is not None:
            mask = attention_mask[:, None, None, :]  # [B,1,1,L]
            scores = jnp.where(mask == 0, NEG_INF, scores)
        weights = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        weights = nn.Dropout(self.dropout, deterministic=not train)(weights)

        ctx = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, L, self.embed_dim)
        out = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                       name="W_o")(ctx)
        return out, weights


class FeedForwardNetwork(nn.Module):
    """Linear(d→d_ff) → ReLU → Dropout → Linear(d_ff→d)
    (reference: models/text_encoder.py:268-324)."""

    embed_dim: int
    hidden_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")(x)


class TransformerEncoderLayer(nn.Module):
    """Pre-norm residual layer: LN→MHA→+x, LN→FFN→+x
    (reference: models/text_encoder.py:327-399)."""

    embed_dim: int
    num_heads: int
    ffn_hidden_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        normed = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        attended, attn_weights = MultiHeadSelfAttention(
            self.embed_dim, self.num_heads, self.dropout, self.dtype,
            name="self_attention",
        )(normed, attention_mask, train)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(attended)

        normed = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        ff = FeedForwardNetwork(
            self.embed_dim, self.ffn_hidden_dim, self.dropout, self.dtype,
            name="ffn",
        )(normed, train)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(ff)
        return x, attn_weights


def _embed_init(embed_dim: int, pad_idx: Optional[int]):
    """Normal(0, d^-0.5) with the PAD row zeroed
    (reference: models/text_encoder.py:472-477)."""
    base = nn.initializers.normal(stddev=embed_dim ** -0.5)

    def init(key, shape, dtype=jnp.float32):
        emb = base(key, shape, dtype)
        if pad_idx is not None:
            emb = emb.at[pad_idx].set(0.0)
        return emb

    return init


class TransformerTextEncoder(nn.Module):
    """Full question encoder: embed·√d + sinusoidal PE + N pre-norm layers
    + final LN; returns (sequence [B,L,D], masked-mean pooled [B,D])
    (reference: models/text_encoder.py:402-607)."""

    vocab_size: int
    embed_dim: int = 256
    num_layers: int = 4
    num_heads: int = 8
    ffn_hidden_dim: int = 1024
    max_length: int = 50
    dropout: float = 0.1
    pad_idx: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        token_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_attention: bool = False,
    ):
        x = nn.Embed(
            self.vocab_size,
            self.embed_dim,
            embedding_init=_embed_init(self.embed_dim, self.pad_idx),
            dtype=self.dtype,
            name="token_embedding",
        )(token_ids)
        x = x * math.sqrt(self.embed_dim)
        x = PositionalEncoding(
            self.embed_dim, self.max_length, self.dropout, self.dtype,
            name="positional_encoding",
        )(x, train)

        all_weights = []
        for i in range(self.num_layers):
            x, w = TransformerEncoderLayer(
                self.embed_dim, self.num_heads, self.ffn_hidden_dim,
                self.dropout, self.dtype, name=f"layer{i}",
            )(x, attention_mask, train)
            all_weights.append(w)

        encoded = nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)

        if attention_mask is not None:
            m = attention_mask[..., None].astype(encoded.dtype)
            pooled = (encoded * m).sum(axis=1) / jnp.clip(m.sum(axis=1), 1, None)
        else:
            pooled = encoded.mean(axis=1)

        if return_attention:
            return encoded, pooled, all_weights
        return encoded, pooled
