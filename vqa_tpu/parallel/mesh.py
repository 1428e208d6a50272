"""Device mesh + sharding rules — the TPU-native parallelism layer.

The reference has NO parallelism (single device, no collectives —
SURVEY.md §2.6). Here every program is built mesh-first:

- a 2-D ``Mesh`` with axes ``('data', 'model')``; v5e-1 is just mesh (1,1)
- batches shard over ``data`` (DP): XLA emits the gradient ``psum`` over ICI
- large matmul weights optionally shard over ``model`` (TP): attention
  Q/K/V projections and FFN expansions split column-wise, their consumers
  row-wise, so each TP pair needs a single reduce per block

Scaling knobs live in MeshConfig (vqa_tpu/utils/config.py); multi-chip is a
config change, not a code change.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    data_parallel=-1 → use all devices not consumed by model_parallel.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if model_parallel <= 0:
        model_parallel = 1
    if data_parallel <= 0:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel > n:
        # named error (not assert) so direct callers keep the guard under -O
        raise ValueError(
            f"mesh {data_parallel}×{model_parallel} needs "
            f"{data_parallel * model_parallel} devices but only {n} are "
            f"available (use --virtual-devices on CPU, or lower the degrees)"
        )
    grid = np.array(devs[: data_parallel * model_parallel]).reshape(
        data_parallel, model_parallel
    )
    return Mesh(grid, (data_axis, model_axis))


def mesh_from_config(cfg=None, batch_divisor: Optional[int] = None) -> Mesh:
    """Build the mesh described by a ``MeshConfig`` (defaults to the global
    ``MESH`` singleton) — the path the Trainer/CLIs use, so parallelism is a
    config/flag change, not a code change.

    ``data_parallel=-1`` (auto) uses every device not consumed by
    ``model_parallel``; when ``batch_divisor`` is given the auto DP degree is
    clamped to a divisor of it so sharded batches always split evenly.
    """
    import math

    from vqa_tpu.utils.config import MESH

    cfg = cfg or MESH
    n_dev = len(jax.devices())
    mp = max(cfg.model_parallel, 1)
    if n_dev % mp != 0:
        raise ValueError(f"model_parallel={mp} does not divide {n_dev} devices")
    dp = cfg.data_parallel
    if dp <= 0:
        dp = n_dev // mp
        if batch_divisor:
            dp = math.gcd(dp, batch_divisor) or 1
    elif batch_divisor and batch_divisor % dp != 0:
        # fail fast with a named reason; otherwise the first sharded batch
        # dies deep inside device_put with an opaque XLA divisibility error
        raise ValueError(
            f"data_parallel={dp} does not divide the batch size "
            f"{batch_divisor}; pick a divisor or use data_parallel=-1 (auto)"
        )
    if dp * mp > n_dev:
        raise ValueError(
            f"mesh {dp}×{mp} needs {dp * mp} devices but only {n_dev} are "
            f"available (use --virtual-devices on CPU, or lower the degrees)"
        )
    return create_mesh(
        data_parallel=dp,
        model_parallel=mp,
        data_axis=cfg.data_axis,
        model_axis=cfg.model_axis,
    )


# ---------------------------------------------------------------------------
# Tensor-parallel parameter partition rules
# ---------------------------------------------------------------------------
# Matched against the '/'-joined flax param path. First hit wins; default is
# full replication. Column-parallel (output dim on 'model') for Q/K/V and
# FFN-in; row-parallel (input dim on 'model') for O and FFN-out — the
# Megatron pairing, so XLA inserts one all-reduce per attention/FFN block.

_TP_RULES = [
    # attention projections (self- and cross-)
    (re.compile(r".*(W_q|W_k|W_v)/kernel$"), P(None, "model")),
    (re.compile(r".*W_o/kernel$"), P("model", None)),
    # transformer FFN
    (re.compile(r".*ffn/fc1/kernel$"), P(None, "model")),
    (re.compile(r".*ffn/fc1/bias$"), P("model")),
    (re.compile(r".*ffn/fc2/kernel$"), P("model", None)),
    # cross-attention FFN
    (re.compile(r".*ffn_fc1/kernel$"), P(None, "model")),
    (re.compile(r".*ffn_fc1/bias$"), P("model")),
    (re.compile(r".*ffn_fc2/kernel$"), P("model", None)),
    # answer head MLP
    (re.compile(r".*answer_head/fc1/kernel$"), P(None, "model")),
    (re.compile(r".*answer_head/fc1/bias$"), P("model")),
    (re.compile(r".*answer_head/fc2/kernel$"), P("model", None)),
    # vocab-sharded embedding
    (re.compile(r".*token_embedding/embedding$"), P("model", None)),
]


def param_spec(path: str) -> P:
    """PartitionSpec for one param path ('/'-joined)."""
    for rx, spec in _TP_RULES:
        if rx.match(path):
            return spec
    return P()


def variables_shardings(variables: Dict[str, Any], mesh: Mesh):
    """Pytree of NamedSharding matching ``variables`` (params TP-sharded per
    rules, batch_stats and everything else replicated)."""

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in kp
        )

    shardings = []
    for kp, leaf in flat:
        p = path_str(kp)
        spec = param_spec(p) if p.startswith("params") else P()
        # never shard a dim the leaf doesn't have / isn't divisible by
        ndim = getattr(leaf, "ndim", 0)
        axes = list(spec)
        if len(axes) > ndim:
            spec = P()
        else:
            ok = True
            for d, ax in enumerate(axes):
                if ax is None:
                    continue
                size = mesh.shape[ax]
                if leaf.shape[d] % size != 0:
                    ok = False
            if not ok:
                spec = P()
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_variables(variables: Dict[str, Any], mesh: Mesh):
    """Place variables onto the mesh according to the TP rules."""
    sh = variables_shardings(variables, mesh)
    return jax.tree_util.tree_map(jax.device_put, variables, sh)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Batch arrays: leading dim split across the data axis."""
    return NamedSharding(mesh, P(data_axis))
