"""Multimodal fusion: image projection → cross-attention → gated pooling.

TPU-native re-design of the reference fusion module
(reference: models/fusion.py:30-363): project the [B,7,7,512] NHWC feature
map to 49 image tokens at d=256 (+learnable position embeddings), run the
2-layer cross-attention stack with the question as query, masked-mean pool
both the attended and raw text features, combine through a sigmoid gate,
and LayerNorm the result.

NHWC note: the reference flattens [B,512,7,7] → [B,49,512] with position
index p = h·W + w (models/fusion.py:101-103); NHWC's natural
[B,7,7,512] → [B,49,512] reshape produces the *same* token order, so
imported position embeddings line up exactly.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vqa_tpu.models.cross_attention import StackedCrossAttention


class ImageFeatureProjector(nn.Module):
    """[B,H,W,C] → [B,H·W,D] via Linear+LN+Dropout, plus learnable position
    embeddings init 0.02·randn (reference: models/fusion.py:30-112)."""

    in_channels: int
    embed_dim: int
    spatial_size: int = 7
    use_position_embed: bool = True
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_features: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = image_features.shape
        n = h * w
        x = image_features.reshape(b, n, c)  # token p = h*W + w, same as ref
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="proj_norm")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.use_position_embed:
            num_positions = self.spatial_size * self.spatial_size
            pos = self.param(
                "position_embedding",
                nn.initializers.normal(stddev=0.02),
                (1, num_positions, self.embed_dim),
                jnp.float32,
            )
            x = x + pos[:, :n, :].astype(self.dtype)
        return x


class GatingMechanism(nn.Module):
    """g = σ(Linear([x;y])); out = g·x + (1−g)·y
    (reference: models/fusion.py:115-168)."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        g = nn.sigmoid(
            nn.Dense(self.embed_dim, dtype=self.dtype, name="gate")(
                jnp.concatenate([x, y], axis=-1)
            )
        )
        return g * x + (1 - g) * y


class MultimodalFusion(nn.Module):
    """Full fusion block (reference: models/fusion.py:171-336).

    Shape tracking:
        image_features [B,7,7,512] → projected [B,49,256]
        text_features  [B,20,256]  → attended  [B,20,256]
        pooled/gated/normed        → fused     [B,256]
    """

    image_channels: int = 512
    image_spatial_size: int = 7
    embed_dim: int = 256
    num_heads: int = 8
    num_cross_layers: int = 2
    dropout: float = 0.1
    use_gating: bool = True
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_features: jnp.ndarray,
        text_features: jnp.ndarray,
        text_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, Dict]:
        image_projected = ImageFeatureProjector(
            in_channels=self.image_channels,
            embed_dim=self.embed_dim,
            spatial_size=self.image_spatial_size,
            dropout=self.dropout,
            dtype=self.dtype,
            name="image_projector",
        )(image_features, train)

        cross_attended, attention_weights = StackedCrossAttention(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            num_layers=self.num_cross_layers,
            dropout=self.dropout,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="cross_attention",
        )(
            query=text_features,
            key_value=image_projected,
            query_mask=text_mask,
            key_value_mask=None,  # all 49 image positions valid (ref :296)
            train=train,
        )

        if text_mask is not None:
            m = text_mask[..., None].astype(cross_attended.dtype)
            denom = jnp.clip(m.sum(axis=1), 1, None)
            attended_pooled = (cross_attended * m).sum(axis=1) / denom
            text_pooled = (text_features * m).sum(axis=1) / denom
        else:
            attended_pooled = cross_attended.mean(axis=1)
            text_pooled = text_features.mean(axis=1)

        if self.use_gating:
            fused = GatingMechanism(self.embed_dim, dtype=self.dtype,
                                    name="gate")(attended_pooled, text_pooled)
        else:
            fused = attended_pooled + text_pooled

        fused = nn.LayerNorm(dtype=self.dtype, name="output_norm")(fused)

        aux = {
            "cross_attention_weights": attention_weights,
            "image_projected": image_projected,
            "attended_pooled": attended_pooled,
            "text_pooled": text_pooled,
        }
        return fused, aux


def attention_visualization(attention_weights, spatial_size: int = 7) -> jnp.ndarray:
    """Average per-layer [B,H,L_q,L_kv] weights over layers and heads and
    reshape to [B,L_q,H,W] (reference: models/fusion.py:338-363)."""
    avg = jnp.stack(attention_weights, axis=0).mean(axis=0).mean(axis=1)
    b, lq, lkv = avg.shape
    return avg.reshape(b, lq, spatial_size, spatial_size)
