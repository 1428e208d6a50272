"""Fused Squeeze-and-Excitation Pallas TPU kernel.

One grid step per image: global-average-pool over H·W, the two biasless
FC layers (ReLU between, sigmoid after), and the per-channel rescale all
happen in a single VMEM-resident pass — no HBM round-trip for the pooled
vector or the attention scale.

TPU-native replacement for the reference's four-op SE chain
(reference: models/attention_modules.py:91-136). Exposed as a library op —
not wired into the model path, where XLA already fuses the SE epilogue
(see KernelConfig's docstring); numerics validated against the XLA path in
tests/test_ops.py and bit-exact compiled on hardware
(scripts/validate_kernels_tpu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _se_kernel(x_ref, w1_ref, w2_ref, out_ref):
    # x: [1, HW, C]; w1: [C, r]; w2: [r, C]
    x = x_ref[0].astype(jnp.float32)  # [HW, C]
    hw = x.shape[0]
    pooled = jnp.sum(x, axis=0, keepdims=True) * (1.0 / hw)  # [1, C]
    hidden = jnp.maximum(
        jnp.dot(pooled, w1_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32),
        0.0,
    )  # [1, r]
    scale = jax.nn.sigmoid(
        jnp.dot(hidden, w2_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    )  # [1, C]
    out_ref[0] = (x * scale).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_se_flat(x, w1, w2, interpret):
    b, hw, c = x.shape
    return pl.pallas_call(
        _se_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=interpret,
    )(x, w1, w2)


def fused_se(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused SE attention.

    Args:
        x: [B, H, W, C] NHWC features.
        w1: [C, C/r] squeeze weights (flax Dense kernel layout).
        w2: [C/r, C] excitation weights.
        interpret: force interpreter mode; default = auto (True off-TPU).

    Returns:
        [B, H, W, C] rescaled features.
    """
    if interpret is None:
        interpret = _interpret_default()
    b, h, w, c = x.shape
    out = _fused_se_flat(x.reshape(b, h * w, c), w1, w2, interpret)
    return out.reshape(b, h, w, c)


def xla_se(x: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    """Unfused XLA path (fallback / kernel parity oracle)."""
    pooled = jnp.mean(x, axis=(1, 2))
    hidden = jax.nn.relu(pooled @ w1)
    scale = jax.nn.sigmoid(hidden @ w2)
    return x * scale[:, None, None, :]
