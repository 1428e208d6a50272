"""The complete VQA model: CNN + text encoder + fusion + answer head.

TPU-native re-design of the reference top-level model
(reference: models/vqa_model.py:30-432). Same composition and hyperparameter
surface; the whole forward (pixels+ids → 1000-way logits) is one jittable
pure function — the single XLA program the trainer, evaluator, and server
all call.

Input layout: images are **NHWC** [B, 224, 224, 3] (TPU-native) — the
reference takes NCHW [B, 3, 224, 224].
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqa_tpu.models.cnn_backbone import CustomResNet
from vqa_tpu.models.cross_attention import xavier_uniform
from vqa_tpu.models.fusion import MultimodalFusion, attention_visualization
from vqa_tpu.models.text_encoder import TransformerTextEncoder
from vqa_tpu.utils.config import ModelConfig


class AnswerHead(nn.Module):
    """3-layer MLP classifier 256→512→256→1000 with ReLU + Dropout(0.3),
    Xavier init (reference: models/vqa_model.py:30-104)."""

    input_dim: int
    hidden_dim: int
    num_answers: int
    dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, kernel_init=xavier_uniform,
                     dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.hidden_dim // 2, kernel_init=xavier_uniform,
                     dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_answers, kernel_init=xavier_uniform,
                        dtype=self.dtype, name="fc3")(x)


class VQAModel(nn.Module):
    """Composes image encoder, text encoder, fusion, and answer head
    (reference: models/vqa_model.py:107-311).

    Call signature:
        logits, aux = model.apply(variables, images, token_ids, mask,
                                  train=..., return_aux=...)
    with images [B, H, W, 3] NHWC.
    """

    config: ModelConfig
    use_pallas_cross_attention: bool = False
    stem_s2d: bool = False
    stem_fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        token_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_aux: bool = False,
    ):
        cfg = self.config

        image_features = CustomResNet(
            in_channels=cfg.in_channels,
            base_channels=cfg.base_channels,
            stage_channels=tuple(cfg.stage_channels),
            num_blocks=tuple(cfg.blocks_per_stage),
            use_se=cfg.use_se_attention,
            use_spatial=cfg.use_spatial_attention,
            se_reduction=cfg.se_reduction,
            stem_s2d=self.stem_s2d,
            stem_fused=self.stem_fused,
            dtype=self.dtype,
            name="image_encoder",
        )(images, train)

        text_features, text_pooled = TransformerTextEncoder(
            vocab_size=cfg.vocab_size,
            embed_dim=cfg.embed_dim,
            num_layers=cfg.num_transformer_layers,
            num_heads=cfg.num_attention_heads,
            ffn_hidden_dim=cfg.ffn_hidden_dim,
            max_length=cfg.max_question_length,
            dropout=cfg.dropout,
            pad_idx=cfg.pad_idx,
            dtype=self.dtype,
            name="text_encoder",
        )(token_ids, attention_mask, train)

        fused, fusion_aux = MultimodalFusion(
            image_channels=cfg.stage_channels[-1],
            image_spatial_size=cfg.feature_spatial_size,
            embed_dim=cfg.embed_dim,
            num_heads=cfg.num_attention_heads,
            num_cross_layers=cfg.num_cross_layers,
            dropout=cfg.dropout,
            use_gating=cfg.use_gating,
            use_pallas=self.use_pallas_cross_attention,
            dtype=self.dtype,
            name="fusion",
        )(image_features, text_features, attention_mask, train)

        logits = AnswerHead(
            input_dim=cfg.embed_dim,
            hidden_dim=cfg.embed_dim * 2,
            num_answers=cfg.num_answers,
            dropout=cfg.answer_dropout,
            dtype=self.dtype,
            name="answer_head",
        )(fused, train)

        # logits always f32 for a stable softmax/loss regardless of policy
        logits = logits.astype(jnp.float32)

        if return_aux:
            aux = {
                "image_features": image_features,
                "text_features": text_features,
                "text_pooled": text_pooled,
                "fused": fused,
                **fusion_aux,
            }
            return logits, aux
        return logits, None


# ---------------------------------------------------------------------------
# Factories and functional helpers
# ---------------------------------------------------------------------------

def create_vqa_model(
    config: Optional[ModelConfig] = None,
    use_attention: Optional[bool] = None,
    dtype: jnp.dtype = jnp.float32,
    use_pallas_cross_attention: Optional[bool] = None,
    stem_s2d: bool = False,
    stem_fused: Optional[bool] = None,
    **overrides,
) -> VQAModel:
    """Factory mirroring the reference's (models/vqa_model.py:383-407).

    ``use_attention=False`` disables both SE and spatial attention (the
    ``--no-attention`` ablation). ``stem_s2d`` switches the stem conv to the
    space-to-depth execution plan (same parameters, same math — see
    ``StemConv``).
    """
    import dataclasses

    if use_pallas_cross_attention is None or stem_fused is None:
        from vqa_tpu.utils.config import KERNELS

        if use_pallas_cross_attention is None:
            use_pallas_cross_attention = KERNELS.use_pallas_cross_attention
        if stem_fused is None:
            stem_fused = KERNELS.use_fused_stem

    cfg = config or ModelConfig()
    if overrides:
        if "base_channels" in overrides and "stage_channels" not in overrides:
            # rederive the (1,2,4,8)·base ramp instead of silently keeping
            # the previous config's resolved widths
            overrides = {**overrides, "stage_channels": None}
        cfg = dataclasses.replace(cfg, **overrides)
    if use_attention is not None:
        cfg = dataclasses.replace(
            cfg,
            use_se_attention=use_attention,
            use_spatial_attention=use_attention,
        )
    return VQAModel(config=cfg, dtype=dtype,
                    use_pallas_cross_attention=use_pallas_cross_attention,
                    stem_s2d=stem_s2d, stem_fused=stem_fused)


def init_vqa_model(
    model: VQAModel, rng: jax.Array, batch_size: int = 1
) -> Dict[str, Any]:
    """Initialize variables ({'params', 'batch_stats'}) with dummy inputs.

    Jitted: flax ``init`` would otherwise run eagerly and compile every op
    separately — one XLA program keeps initialization fast and cacheable.
    """
    cfg = model.config
    images = jnp.zeros(
        (batch_size, cfg.image_size, cfg.image_size, cfg.in_channels),
        model.dtype,
    )
    ids = jnp.zeros((batch_size, cfg.max_question_length), jnp.int32)
    mask = jnp.ones((batch_size, cfg.max_question_length), jnp.int32)
    init_fn = jax.jit(lambda r, im, i, m: model.init(r, im, i, m, train=False))
    return init_fn(rng, images, ids, mask)


def count_parameters(variables: Dict[str, Any]) -> Dict[str, int]:
    """Per-component parameter counts (reference: models/vqa_model.py:371-380)."""
    params = variables["params"] if "params" in variables else variables
    counts = {}
    for name in ("image_encoder", "text_encoder", "fusion", "answer_head"):
        if name in params:
            counts[name] = sum(
                x.size for x in jax.tree_util.tree_leaves(params[name])
            )
    counts["total"] = sum(counts.values())
    return counts


@functools.lru_cache(maxsize=32)
def _jitted_forward(model: VQAModel):
    """One compiled XLA program per (model, shape) for the inference path."""

    @jax.jit
    def fwd(variables, images, token_ids, attention_mask):
        logits, _ = model.apply(
            variables, images, token_ids, attention_mask, train=False
        )
        return logits

    return fwd


def forward_logits(
    model: VQAModel,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    token_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Jit-compiled forward pass → [B, num_answers] f32 logits."""
    return _jitted_forward(model)(variables, images, token_ids, attention_mask)


def predict_topk(
    model: VQAModel,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    token_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    top_k: int = 5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k answer indices and probabilities
    (reference: models/vqa_model.py:313-339). Runs the jitted forward."""
    logits = forward_logits(model, variables, images, token_ids, attention_mask)
    probs = jax.nn.softmax(logits, axis=-1)
    top_probs, top_idx = jax.lax.top_k(probs, top_k)
    return top_idx, top_probs


def get_attention_maps(
    model: VQAModel,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    token_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Cross-attention maps for visualization
    (reference: models/vqa_model.py:341-369)."""
    _, aux = model.apply(
        variables, images, token_ids, attention_mask,
        train=False, return_aux=True,
    )
    weights = aux["cross_attention_weights"]
    return {
        "cross_attention": weights,
        "cross_attention_spatial": attention_visualization(
            weights, model.config.feature_spatial_size
        ),
    }
