"""Fused CNN-stem Pallas TPU kernel: 7x7/2 conv + BN affine + ReLU +
3x3/2 maxpool in one VMEM-resident pass.

The reference's stem (reference: models/cnn_backbone.py:349-354) is a
7x7 stride-2 conv (pad 3, no bias) -> BatchNorm -> ReLU -> 3x3 stride-2
maxpool (pad 1): [B,224,224,3] -> [B,56,56,64]. Under XLA the conv's
[B,112,112,64] output round-trips HBM before the maxpool reads it
(~3.2 MB/pair bf16 — the stem's memory-bound floor, docs/PERF.md). This
kernel keeps that intermediate in VMEM.

Design notes (why it looks the way it does):
  * C_in=3 means a naive NHWC conv formulation wastes 125/128 MXU lanes.
    The kernel instead consumes a 2x2-POLYPHASE decomposition of the
    padded input (12 planes of [115,115]: even/odd rows x even/odd cols
    x channel), which turns every stride-2 kernel tap into a
    *unit-stride* window of one plane — no strided lane/sublane reads.
  * Per (16-conv-row block, kernel row kh) it im2col-packs the 21 taps
    (7 kw x 3 c) into a [32, 16, 128] VMEM scratch and contracts with a
    repacked [32, 64] weight slice on the MXU (reduction 21->32,
    zero-padded), accumulating [16, 128, 64] in f32. Block size 16 keeps
    every dynamic sublane offset tile-aligned for bf16 (16,128) tiling.
  * BN is folded to a per-channel affine (inference mode: scale =
    gamma/sqrt(var+eps), bias = beta - mean*scale), applied with ReLU
    before the conv block is stored — so the kernel serves the
    inference/serving path; training BN needs batch stats and keeps the
    XLA path.
  * The maxpool reads the VMEM conv buffer with stride-2 slices on the
    outer/sublane dims only (C stays in lanes), and zero-padding is
    safe for the pool edge because post-ReLU activations are >= 0.

Exposed as a library op behind KernelConfig (default off); numerics
validated against the XLA path in tests/test_ops.py (interpret) and on
hardware (f32 max diff 3.6e-7). MEASURED AND REJECTED as the default
execution plan: 71.5 vs 11.6 us/pair for the XLA stem at b=1024 bf16 —
see "Execution plans measured and rejected" in docs/PERF.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# conv geometry (fixed to the stem's shapes)
_IN = 224          # input H = W
_PAD = 3           # conv padding
_CONV = 112        # conv output H = W
_OUT = 56          # pool output H = W
_COUT = 64
_PLANE = 128       # phase-plane H = W: (224+6)/2 = 115 valid rows/cols,
                   # zero-padded to 128 so the kernel's aligned 32-row
                   # window loads (rb*16 .. rb*16+31) stay in bounds
_TAPS = 21         # 7 kw x 3 c, padded to 32 for the MXU
_RB = 16           # conv rows per block: every dynamic sublane offset in
                   # the kernel is a multiple of 16, which Mosaic requires
                   # for bf16 (16,128) tiling (8-row blocks compiled for
                   # f32 but were rejected for bf16)
_NRB = _CONV // _RB


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _stem_kernel(xp_ref, wk_ref, scale_ref, bias_ref, out_ref,
                 conv_ref, m_ref):
    """One image: xp [1,12,128,128] phase planes, wk [7,32,64],
    scale/bias [8,64] (broadcast rows), out [1,56,56,64];
    scratch: conv [112,128,64], m [32,16,128] im2col.

    Every dynamic sublane offset here is a multiple of 16 and every
    sub-tile selection is a reshape + STATIC index or a static slice of a
    register value — Mosaic's bf16 (16,128) tiling rejects anything less
    (found by compiling on hardware; interpret mode accepts anything).
    """
    # zero the im2col scratch once: tap rows >= 21 and lanes >= 112 stay
    # zero across all iterations (every iteration rewrites [:21, :, :112])
    m_ref[...] = jnp.zeros(m_ref.shape, m_ref.dtype)

    def row_block(rb, _):
        acc = jnp.zeros((_RB, 128, _COUT), jnp.float32)
        for kh in range(7):
            pr, dr = kh % 2, kh // 2
            for kw in range(7):
                pc, dc = kw % 2, kw // 2
                for c in range(3):
                    plane = pr * 6 + pc * 3 + c
                    # aligned 32-row window + static in-register shift:
                    # rows rb*16+dr .. rb*16+dr+15 of the plane
                    rows32 = xp_ref[0, plane, pl.dslice(rb * _RB, 32),
                                    dc:dc + _CONV]
                    m_ref[kw * 3 + c, :, 0:_CONV] = rows32[dr:dr + _RB]
            # [32,16,128] x [32,64] -> [16,128,64], contracting the tap dim
            acc = acc + jax.lax.dot_general(
                m_ref[...], wk_ref[kh],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        y = jnp.maximum(acc * scale_ref[0][None, None, :]
                        + bias_ref[0][None, None, :], 0.0)
        conv_ref[pl.dslice(rb * _RB, _RB)] = y.astype(conv_ref.dtype)
        return 0

    jax.lax.fori_loop(0, _NRB, row_block, 0)

    # maxpool 3x3/2 pad 1 over conv_ref [112(row), 128(col; 112 valid), 64],
    # in chunks of 8 pool rows (16 conv rows): whole-array ops over the
    # buffer would materialize ~25 MB of temporaries on the VMEM stack,
    # past the 16 MB scoped-vmem limit. The window row 2k-1 that crosses
    # the chunk boundary rides the fori_loop carry (an unaligned
    # single-row re-read of conv_ref would break the tiling rule above).
    def pool_block(pb, prev_odd):
        # pool rows pb*8 .. pb*8+7 <- conv rows pb*16-1 .. pb*16+15
        cb = conv_ref[pl.dslice(pb * 16, 16)]              # [16,128,64]
        cbr = cb.reshape(8, 2, 128, _COUT)
        r_even, r_odd = cbr[:, 0], cbr[:, 1]               # conv rows 2k/2k+1
        r_odd_sh = jnp.concatenate([prev_odd, r_odd[:-1]], axis=0)
        rows_max = jnp.maximum(jnp.maximum(r_even, r_odd),
                               r_odd_sh)                   # [8,128,64]
        rm = rows_max.reshape(8, 64, 2, _COUT)
        c_even = rm[:, :_OUT, 0]                           # [8,56,64]
        c_odd = rm[:, :_OUT, 1]
        zcol = jnp.zeros((c_odd.shape[0], 1, c_odd.shape[2]), c_odd.dtype)
        c_odd_sh = jnp.concatenate([zcol, c_odd[:, :-1]], axis=1)
        out_ref[0, pl.dslice(pb * 8, 8)] = jnp.maximum(
            jnp.maximum(c_even, c_odd), c_odd_sh
        ).astype(out_ref.dtype)
        return r_odd[-1:]  # conv row pb*16+15, window row 2k-1 next chunk

    jax.lax.fori_loop(0, _OUT // 8, pool_block,
                      jnp.zeros((1, 128, _COUT), conv_ref.dtype))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_stem_planes(xp, wk, scale, bias, interpret):
    b = xp.shape[0]
    return pl.pallas_call(
        _stem_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 12, _PLANE, _PLANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _OUT, _OUT, _COUT),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, _OUT, _OUT, _COUT), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((_CONV, 128, _COUT), xp.dtype),
            pltpu.VMEM((32, _RB, 128), xp.dtype),
        ],
        interpret=interpret,
    )(xp, wk, scale, bias)


def _phase_planes(x: jnp.ndarray) -> jnp.ndarray:
    """[B,224,224,3] -> [B,12,128,128] polyphase planes (XLA-side prep;
    fuses with the preceding normalize)."""
    xpad = jnp.pad(x, ((0, 0), (_PAD, _PAD), (_PAD, _PAD), (0, 0)))
    planes = [
        xpad[:, pr::2, pc::2, c]
        for pr in range(2) for pc in range(2) for c in range(3)
    ]
    xp = jnp.stack(planes, axis=1)  # [B,12,115,115]
    return jnp.pad(xp, ((0, 0), (0, 0), (0, _PLANE - 115),
                        (0, _PLANE - 115)))


def pack_stem_weights(w: np.ndarray | jnp.ndarray) -> jnp.ndarray:
    """[7,7,3,64] HWIO conv kernel -> [7,32,64] tap-packed (kw*3+c)."""
    wk = jnp.zeros((7, 32, _COUT), jnp.result_type(w))
    w = jnp.asarray(w)
    for kw in range(7):
        for c in range(3):
            wk = wk.at[:, kw * 3 + c, :].set(w[:, kw, c, :])
    return wk


def fused_stem(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused stem: conv7x7/2 + affine(BN-eval) + ReLU + maxpool3x3/2.

    Args:
        x: [B, 224, 224, 3] NHWC input (post-normalize).
        w: [7, 7, 3, 64] HWIO conv kernel.
        scale: [64] folded BN scale  (gamma / sqrt(var + eps)).
        bias:  [64] folded BN bias   (beta - mean * scale).
        interpret: force interpreter mode; default = auto (True off-TPU).

    Returns:
        [B, 56, 56, 64] stem output.
    """
    if interpret is None:
        interpret = _interpret_default()
    xp = _phase_planes(x)
    wk = pack_stem_weights(w).astype(x.dtype)
    # pass affine rows pre-broadcast to [8,64] so the minor dims tile
    sc = jnp.broadcast_to(scale.astype(jnp.float32)[None, :], (8, _COUT))
    bi = jnp.broadcast_to(bias.astype(jnp.float32)[None, :], (8, _COUT))
    return _fused_stem_planes(xp, wk, sc, bi, interpret)


def xla_stem(x, w, scale, bias):
    """Unfused XLA path (fallback / kernel parity oracle)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(2, 2),
        padding=((_PAD, _PAD), (_PAD, _PAD)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jnp.maximum(y * scale.astype(y.dtype) + bias.astype(y.dtype), 0.0)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
