"""Validate the Pallas kernels COMPILED on real TPU hardware.

The pytest suite exercises them in interpreter mode on CPU; this script is
the hardware check: fused vs XLA paths at full VQA shapes, plus the full
model forward with the fused cross-attention enabled.

Run: python scripts/validate_kernels_tpu.py  (needs the TPU)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vqa_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vqa_tpu.ops.cross_attention_kernel import (  # noqa: E402
    fused_cross_attention,
    xla_cross_attention,
)
from vqa_tpu.ops.se_kernel import fused_se, xla_se  # noqa: E402


def main() -> int:
    if jax.default_backend() == "cpu":
        print("needs TPU; default backend is cpu", file=sys.stderr)
        return 2
    rng = np.random.default_rng(0)
    ok = True

    # cross-attention at full VQA shapes: B=8, H=8, Lq=20, Lkv=49, dh=32
    q = jnp.asarray(rng.normal(size=(8, 8, 20, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(8, 8, 49, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(8, 8, 49, 32)).astype(np.float32))
    ctx_f, w_f = jax.block_until_ready(
        fused_cross_attention(q, k, v, scale=32 ** 0.5, interpret=False)
    )
    ctx_x, w_x = xla_cross_attention(q, k, v, scale=32 ** 0.5)
    err_c = float(jnp.max(jnp.abs(ctx_f - ctx_x)))
    err_w = float(jnp.max(jnp.abs(w_f - w_x)))
    rows = float(jnp.max(jnp.abs(jnp.sum(w_f, -1) - 1.0)))
    print(f"cross-attn compiled: ctx err {err_c:.2e}, w err {err_w:.2e}, "
          f"row-sum err {rows:.2e}")
    ok &= err_c < 1e-4 and err_w < 1e-5 and rows < 1e-5

    # SE at stage-4 shapes: B=8, 7x7, C=512, r=16
    x = jnp.asarray(rng.normal(size=(8, 7, 7, 512)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(512, 32)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.normal(size=(32, 512)).astype(np.float32) * 0.05)
    y_f = jax.block_until_ready(fused_se(x, w1, w2, interpret=False))
    y_x = xla_se(x, w1, w2)
    err_se = float(jnp.max(jnp.abs(y_f - y_x)))
    print(f"fused SE compiled: err {err_se:.2e}")
    ok &= err_se < 1e-4

    # full model with pallas cross-attention vs without
    from vqa_tpu.models import create_vqa_model, init_vqa_model

    kw = dict(dtype=jnp.float32)
    m0 = create_vqa_model(use_pallas_cross_attention=False, **kw)
    m1 = create_vqa_model(use_pallas_cross_attention=True, **kw)
    variables = init_vqa_model(m0, jax.random.PRNGKey(0))
    imgs = jnp.asarray(rng.normal(size=(2, 224, 224, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(4, 10000, size=(2, 20)), jnp.int32)
    mask = jnp.ones((2, 20), jnp.int32)
    f0 = jax.jit(lambda v: m0.apply(v, imgs, ids, mask, train=False)[0])
    f1 = jax.jit(lambda v: m1.apply(v, imgs, ids, mask, train=False)[0])
    l0 = jax.block_until_ready(f0(variables))
    l1 = jax.block_until_ready(f1(variables))
    err_m = float(jnp.max(jnp.abs(l0 - l1)))
    print(f"full model logits, pallas vs xla attention: err {err_m:.2e}")
    ok &= err_m < 1e-3

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)  # axon tunnel teardown can hang the interpreter
