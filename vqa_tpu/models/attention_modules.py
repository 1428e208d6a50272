"""CNN attention modules (SE, spatial, CBAM, 2D self-attention) in Flax/NHWC.

TPU-native re-design of the reference attention blocks
(reference: models/attention_modules.py:27-433). Differences from the
reference that matter on TPU:

- **NHWC layout** (channels-last) everywhere: the TPU-native conv layout,
  so channel reductions are lane-dimension reductions and XLA fuses the
  sigmoid-scale epilogues into the surrounding convs.
- functional Flax modules with a ``train`` flag instead of stateful
  ``nn.Module``; all math identical to the reference so imported PyTorch
  weights reproduce logits bit-closely.
- a fused Pallas SE kernel exists as a library op (vqa_tpu/ops/se_kernel.py,
  validated bit-exact on hardware) but is intentionally NOT wired in here:
  XLA already fuses the GAP→FC→FC→sigmoid→scale epilogue, and a kernel flag
  threaded through the module tree would change the checkpoint param
  structure for no measured gain (see KernelConfig's docstring).

``CBAMBlock`` and ``SelfAttention2D`` exist for API completeness but are
not used in the main model path — matching the reference, which also
defines-but-never-uses them (models/attention_modules.py:246-384).
"""

from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

# Kaiming-normal fan_out, matching the reference CNN init
# (reference: models/cnn_backbone.py:420-438).
kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal"
)


class SEAttention(nn.Module):
    """Squeeze-and-Excitation channel attention.

    squeeze (global avg pool over H,W) → FC bottleneck (C → C/r → C,
    biasless) → sigmoid → per-channel scale
    (reference math: models/attention_modules.py:91-136).

    Input/output: [B, H, W, C] (NHWC).
    """

    channels: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        reduced = max(self.channels // self.reduction, 1)
        # [B, H, W, C] -> [B, C]
        squeezed = jnp.mean(x, axis=(1, 2))
        excited = nn.Dense(
            reduced, use_bias=False, dtype=self.dtype, name="fc1"
        )(squeezed)
        excited = nn.relu(excited)
        excited = nn.Dense(
            self.channels, use_bias=False, dtype=self.dtype, name="fc2"
        )(excited)
        scale = nn.sigmoid(excited)
        # broadcast over H, W (channels-last)
        return x * scale[:, None, None, :]


class SpatialAttention(nn.Module):
    """Spatial attention: channel-max ‖ channel-mean → 7×7 conv (2→1, no
    bias) → sigmoid mask (reference math: models/attention_modules.py:198-243).

    Input/output: [B, H, W, C] (NHWC).
    """

    kernel_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.kernel_size % 2 == 1, "Kernel size must be odd"
        pad = self.kernel_size // 2
        max_pool = jnp.max(x, axis=-1, keepdims=True)
        avg_pool = jnp.mean(x, axis=-1, keepdims=True)
        pooled = jnp.concatenate([max_pool, avg_pool], axis=-1)  # [B,H,W,2]
        attn = nn.Conv(
            1,
            (self.kernel_size, self.kernel_size),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            kernel_init=kaiming_normal_fan_out,
            dtype=self.dtype,
            name="conv",
        )(pooled)
        return x * nn.sigmoid(attn)


class CBAMBlock(nn.Module):
    """SE then spatial attention, sequential (reference:
    models/attention_modules.py:246-308; unused in the main path there too)."""

    channels: int
    reduction: int = 16
    spatial_kernel: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = SEAttention(self.channels, self.reduction, self.dtype, name="se")(x)
        x = SpatialAttention(self.spatial_kernel, self.dtype, name="spatial")(x)
        return x


class SelfAttention2D(nn.Module):
    """Non-local self-attention over H·W pixels with learnable-γ residual
    (reference: models/attention_modules.py:311-384; provided for API
    completeness, not in the main path)."""

    channels: int
    reduction: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        n = h * w
        reduced = c // self.reduction
        q = nn.Conv(reduced, (1, 1), dtype=self.dtype, name="query")(x)
        k = nn.Conv(reduced, (1, 1), dtype=self.dtype, name="key")(x)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="value")(x)
        q = q.reshape(b, n, reduced)
        k = k.reshape(b, n, reduced)
        v = v.reshape(b, n, c)
        attn = jnp.einsum("bqd,bkd->bqk", q, k) / jnp.sqrt(
            jnp.asarray(reduced, self.dtype)
        )
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(self.dtype) * out + x


class AttentionWrapper(nn.Module):
    """Conditionally apply SE and/or spatial attention — the ablation switch
    threaded from ``--no-attention`` (reference: models/attention_modules.py:391-433)."""

    channels: int
    use_se: bool = True
    use_spatial: bool = True
    se_reduction: int = 16
    spatial_kernel: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_se:
            x = SEAttention(
                self.channels, self.se_reduction, self.dtype, name="se"
            )(x)
        if self.use_spatial:
            x = SpatialAttention(self.spatial_kernel, self.dtype, name="spatial")(x)
        return x
