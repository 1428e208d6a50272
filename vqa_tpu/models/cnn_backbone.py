"""Custom ResNet-18-style CNN backbone in Flax, NHWC, BatchNorm batch_stats.

TPU-native re-design of the reference backbone
(reference: models/cnn_backbone.py:41-493): identical topology —
stem (7×7/2 conv + BN + ReLU + 3×3/2 maxpool) → 4 stages of [2,2,2,2]
residual blocks with channels 64→128→256→512, SE attention in every stage,
spatial attention only in stages 3-4 — but laid out channels-last so every
conv maps directly onto the MXU's native tiling and XLA fuses the
BN+ReLU+attention epilogues.

Output: [B, 7, 7, 512] feature map (the reference's [B, 512, 7, 7],
transposed to NHWC) — spatial structure preserved for cross-attention,
no global pooling.

BatchNorm under data parallelism: the train step is ONE jitted GSPMD
program, so BN batch statistics are computed over the GLOBAL batch — XLA
inserts the cross-replica reductions when the batch is sharded over the
``data`` mesh axis. Semantics are therefore identical at any DP degree
(equivalent to torch SyncBatchNorm, stronger than the reference's
single-device BN which would silently become per-device stats under DDP).
Proven by ``tests/test_sharding.py::test_bn_under_dp_matches_single_device``:
one dp8 step reproduces the single-device loss and updated batch_stats.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from vqa_tpu.models.attention_modules import (
    AttentionWrapper,
    kaiming_normal_fan_out,
)

# torch BatchNorm2d defaults: eps=1e-5, running-stat momentum 0.1
# (flax momentum = keep-fraction of the old stat = 1 - 0.1).
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def _conv(features: int, kernel: int, stride: int, pad: int, name: str, dtype):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        kernel_init=kaiming_normal_fan_out,
        dtype=dtype,
        name=name,
    )


def _bn(name: str, dtype, train: bool):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        dtype=dtype,
        name=name,
    )


class StemConv(nn.Module):
    """7×7/2 stem convolution with an optional space-to-depth execution path.

    With only 3 input channels, the standard stem conv wastes almost the
    whole MXU contraction dimension. The space-to-depth plan (the MLPerf
    ResNet-on-TPU trick) rearranges the input into 2×2 blocks
    ``[B,H,W,3] → [B,H/2,W/2,12]`` and the 7×7/stride-2 kernel into an
    exactly equivalent 4×4/stride-1 kernel over 12 channels — same math,
    4× the contraction depth, ¼ the spatial positions.

    The stored parameter is identical in both paths (``kernel [7,7,C,F]``,
    same name/shape as ``nn.Conv``), so checkpoints, parameter counts, and
    the torch importer are unaffected; ``s2d`` only changes the execution
    plan. The rearranged kernel is recomputed from the parameter inside the
    jitted program (a 9.4k-element scatter — noise next to the conv).

    Measured on this target chip (bench.py --s2d, b=1024 bf16): 23.0k vs
    24.1k pairs/s — XLA's native handling of the small-channel stem wins,
    so the plan defaults OFF and remains available for other topologies.
    """

    features: int
    s2d: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_normal_fan_out, (7, 7, cin, self.features)
        )
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        if not self.s2d:
            return jax.lax.conv_general_dilated(
                x, k, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn
            )

        b, h, w, c = x.shape
        if h % 2 or w % 2:
            raise ValueError(f"s2d stem needs even H,W, got {(h, w)}")
        # space-to-depth, 2×2 blocks: y[i,j,(di*2+dj)*c+ch] = x[2i+di,2j+dj,ch]
        y = (
            x.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 2, w // 2, 4 * c)
        )
        # Equivalent kernel: output(i) taps x[2i+ki-3] = y-block i+m-2 with
        # ki = 2(m-2)+di+3; odd ki land on di=0 (m=1..3), even on di=1 (m=0..3).
        k4 = jnp.zeros((4, 4, 4 * c, self.features), self.dtype)
        for di in (0, 1):
            km = k[1::2] if di == 0 else k[0::2]
            m0 = 1 - di
            for dj in (0, 1):
                kmn = km[:, 1::2] if dj == 0 else km[:, 0::2]
                n0 = 1 - dj
                blk = di * 2 + dj
                k4 = k4.at[m0:4, n0:4, blk * c:(blk + 1) * c, :].set(kmn)
        return jax.lax.conv_general_dilated(
            y, k4, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn
        )


class _StemConvVars(nn.Module):
    """Declares the stem conv kernel under the SAME scope/param names as
    ``StemConv`` (params/stem_conv/kernel) so the fused-stem execution path
    produces an identical variable tree — checkpoints and the torch
    importer are unaffected by the execution-plan switch."""

    features: int
    in_channels: int = 3

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", kaiming_normal_fan_out,
            (7, 7, self.in_channels, self.features),
        )


class _StemBNVars(nn.Module):
    """Declares the stem BN variables under the same scope/names as
    ``nn.BatchNorm`` (params/stem_bn/{scale,bias} +
    batch_stats/stem_bn/{mean,var}); see ``_StemConvVars``."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean.value, var.value


class ConvBlock(nn.Module):
    """Conv → BN → ReLU helper (reference: models/cnn_backbone.py:41-98;
    defined but unused in the main path there — kept for API completeness)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = _conv(self.features, self.kernel_size, self.stride, self.padding,
                  "conv", self.dtype)(x)
        x = _bn("bn", self.dtype, train)(x)
        return nn.relu(x)


class ResidualBlock(nn.Module):
    """3×3 conv→BN→ReLU→3×3 conv→BN (+1×1 conv+BN shortcut on shape change),
    add, ReLU (reference: models/cnn_backbone.py:101-197)."""

    in_channels: int
    out_channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        out = _conv(self.out_channels, 3, self.stride, 1, "conv1", self.dtype)(x)
        out = _bn("bn1", self.dtype, train)(out)
        out = nn.relu(out)
        out = _conv(self.out_channels, 3, 1, 1, "conv2", self.dtype)(out)
        out = _bn("bn2", self.dtype, train)(out)

        if self.stride != 1 or self.in_channels != self.out_channels:
            identity = _conv(self.out_channels, 1, self.stride, 0,
                             "down_conv", self.dtype)(x)
            identity = _bn("down_bn", self.dtype, train)(identity)

        return nn.relu(out + identity)


class ResidualStage(nn.Module):
    """N residual blocks (first may stride-2) followed by the attention
    wrapper (reference: models/cnn_backbone.py:200-279)."""

    in_channels: int
    out_channels: int
    num_blocks: int = 2
    stride: int = 1
    use_se: bool = True
    use_spatial: bool = True
    se_reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ResidualBlock(
            self.in_channels, self.out_channels, self.stride,
            self.dtype, name="block0",
        )(x, train)
        for i in range(1, self.num_blocks):
            x = ResidualBlock(
                self.out_channels, self.out_channels, 1,
                self.dtype, name=f"block{i}",
            )(x, train)
        x = AttentionWrapper(
            self.out_channels,
            use_se=self.use_se,
            use_spatial=self.use_spatial,
            se_reduction=self.se_reduction,
            dtype=self.dtype,
            name="attention",
        )(x)
        return x


class CustomResNet(nn.Module):
    """From-scratch ResNet-style backbone with SE + spatial attention
    (reference: models/cnn_backbone.py:282-493).

    Shape tracking (NHWC):
        input   [B, 224, 224, 3]
        stem    [B, 56, 56, 64]
        stage1  [B, 56, 56, 64]
        stage2  [B, 28, 28, 128]
        stage3  [B, 14, 14, 256]
        stage4  [B, 7, 7, 512]
    """

    in_channels: int = 3
    base_channels: int = 64
    # per-stage widths; None derives the classic (1, 2, 4, 8)·base ramp
    # (reference knob: utils/config.py cnn_channels=[64,128,256,512])
    stage_channels: Tuple[int, int, int, int] = None
    num_blocks: Tuple[int, int, int, int] = (2, 2, 2, 2)
    use_se: bool = True
    use_spatial: bool = True
    se_reduction: int = 16
    stem_s2d: bool = False
    # Fused Pallas stem (ops/stem_kernel.py): inference-mode only (BN is
    # folded to an affine), applies when the stem geometry matches the
    # kernel (224px input, 3 channels, 64 features); otherwise the call
    # silently uses the XLA path — both paths declare identical variables.
    stem_fused: bool = False
    dtype: jnp.dtype = jnp.float32

    def _channels(self):
        if self.stage_channels is not None:
            return list(self.stage_channels)
        return [self.base_channels * m for m in (1, 2, 4, 8)]

    @property
    def output_channels(self) -> int:
        return self._channels()[-1]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self._channels()

        # Stem: 7×7/2 conv + BN + ReLU + 3×3/2 maxpool
        fused_ok = (
            self.stem_fused and not train
            and x.shape[1] == 224 and x.shape[2] == 224
            and x.shape[-1] == 3 and c[0] == 64
        )
        if fused_ok:
            from vqa_tpu.ops.stem_kernel import fused_stem

            kernel = _StemConvVars(c[0], self.in_channels,
                                   name="stem_conv")()
            scale, bias, mean, var = _StemBNVars(c[0], name="stem_bn")()
            s = scale / jnp.sqrt(var + BN_EPS)
            b = bias - mean * s
            x = fused_stem(x.astype(self.dtype), kernel.astype(self.dtype),
                           s, b)
        else:
            x = StemConv(c[0], s2d=self.stem_s2d, dtype=self.dtype,
                         name="stem_conv")(x)
            x = _bn("stem_bn", self.dtype, train)(x)
            x = nn.relu(x)
            # torch MaxPool2d(3, stride=2, padding=1) pads with -inf
            # semantics; flax max_pool pads with -inf as well.
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )

        # spatial attention only in stages 3-4 (reference:
        # models/cnn_backbone.py:366,381,394,409)
        stage_specs = [
            (c[0], c[0], 1, False),
            (c[0], c[1], 2, False),
            (c[1], c[2], 2, self.use_spatial),
            (c[2], c[3], 2, self.use_spatial),
        ]
        # checkpoint_name is an identity outside of jax.checkpoint; under a
        # save_only_these_names policy it marks stage boundaries as the
        # residuals to keep, so the backward can rematerialize the stage
        # interiors instead of round-tripping them through HBM
        # (scripts/exp_bwd_remat.py measures whether that trade wins).
        x = checkpoint_name(x, "resnet_stem")
        for i, (cin, cout, stride, spatial) in enumerate(stage_specs, start=1):
            x = ResidualStage(
                cin,
                cout,
                num_blocks=self.num_blocks[i - 1],
                stride=stride,
                use_se=self.use_se,
                use_spatial=spatial,
                se_reduction=self.se_reduction,
                dtype=self.dtype,
                name=f"stage{i}",
            )(x, train)
            x = checkpoint_name(x, f"resnet_stage{i}")
        return x


def create_cnn_backbone(
    use_attention: bool = True,
    se_reduction: int = 16,
    dtype: jnp.dtype = jnp.float32,
) -> CustomResNet:
    """Factory (reference: models/cnn_backbone.py:475-493)."""
    return CustomResNet(
        use_se=use_attention,
        use_spatial=use_attention,
        se_reduction=se_reduction,
        dtype=dtype,
    )
