"""Orbax checkpointing with the reference's save/best/resume semantics.

The reference torch.saves
``{epoch, model_state_dict, optimizer_state_dict, scheduler_state_dict,
best_val_accuracy, config, metrics_history}`` (reference:
training/train.py:280-294), copies ``best_model.pth`` on improvement, and
resumes everything (training/train.py:302-320). Here the same contract is
kept: the Orbax tree carries params/batch_stats/opt_state/step plus the
scalar metadata; the model config and metric history ride in a sidecar
JSON so checkpoints are self-describing (reference embeds config the same
way, models/vqa_model.py:226-241).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from vqa_tpu.utils.config import ModelConfig, model_config_dict, model_config_from_dict


def _ckpt_dir(base: str, name: str) -> str:
    return os.path.join(os.path.abspath(base), name)


def _barrier(name: str) -> None:
    """Cross-process sync point; no-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def _remove(path: str) -> None:
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)


def _swap_into_place(tmp: str, path: str) -> None:
    """Atomically-enough replace ``path`` (+ sidecar) with ``tmp``: the
    previous checkpoint stays readable for the entire (slow) save — the
    unsafe window shrinks from the whole Orbax write to two renames, and
    ``_recover`` undoes a crash inside that window on the next load.
    The reference has the same hole at full width: ``torch.save`` writes
    over the live file in place (reference: training/train.py:280-294)."""
    old = path + ".old"
    for p in (old, old + ".meta.json"):
        _remove(p)
    if os.path.exists(path):
        os.rename(path, old)
        if os.path.exists(path + ".meta.json"):
            os.rename(path + ".meta.json", old + ".meta.json")
    os.rename(tmp, path)
    os.rename(tmp + ".meta.json", path + ".meta.json")
    for p in (old, old + ".meta.json"):
        _remove(p)


def _recover(path: str) -> None:
    """If a crash hit between ``_swap_into_place``'s renames, the previous
    checkpoint survives as ``<path>.old`` — restore it. Tolerates a
    concurrent recoverer (multi-host: every process may call this)."""
    old = path + ".old"
    if not os.path.exists(path) and os.path.exists(old):
        try:
            os.rename(old, path)
        except OSError:
            return  # another process won the recovery race
        if not os.path.exists(path + ".meta.json") and os.path.exists(
            old + ".meta.json"
        ):
            try:
                os.rename(old + ".meta.json", path + ".meta.json")
            except OSError:
                pass
        return
    # crash BETWEEN the two forward renames: the new tree landed at path
    # but its sidecar is still at <path>.tmp.meta.json — complete the swap
    # (the Orbax write had fully finished before the swap began)
    tmp_meta = path + ".tmp.meta.json"
    if (
        os.path.exists(path)
        and not os.path.exists(path + ".meta.json")
        and os.path.exists(tmp_meta)
    ):
        try:
            os.rename(tmp_meta, path + ".meta.json")
        except OSError:
            pass


def save_checkpoint(
    base_dir: str,
    name: str,
    train_state_tree: Dict[str, Any],
    model_config: ModelConfig,
    meta: Dict[str, Any],
) -> str:
    """Save a checkpoint tree + sidecar meta JSON, crash-safely: the tree is
    written to a temp dir and swapped in with renames, so a failure mid-save
    never destroys the previous checkpoint. Returns the path."""
    path = _ckpt_dir(base_dir, name)
    tmp = path + ".tmp"
    # Multi-host: EVERY process must enter ckptr.save (Orbax coordinates
    # the distributed write internally), but the sidecar write and the
    # rename swap are primary-only — concurrent swaps would race on the
    # shared directory. A barrier keeps non-primaries from returning (and
    # possibly reading) before the swap lands.
    primary = jax.process_index() == 0
    if primary:
        for p in (tmp, tmp + ".meta.json"):
            _remove(p)
    _barrier("vqa-ckpt-pre-save")
    try:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(tmp, train_state_tree)
        if primary:
            with open(tmp + ".meta.json", "w", encoding="utf-8") as f:
                json.dump(
                    {"config": model_config_dict(model_config), "meta": meta},
                    f,
                    indent=2,
                )
            _swap_into_place(tmp, path)
    finally:
        if primary:
            for p in (tmp, tmp + ".meta.json"):
                _remove(p)
        _barrier("vqa-ckpt-post-swap")
    return path


def load_checkpoint(
    base_dir: str,
    name: str,
    target_tree: Optional[Dict[str, Any]] = None,
) -> Tuple[Dict[str, Any], ModelConfig, Dict[str, Any]]:
    """Load (tree, model_config, meta). ``target_tree`` provides the
    structure/shardings for restoration (required for opt_state etc.)."""
    path = _ckpt_dir(base_dir, name)
    _recover(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target_tree is not None:
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, target_tree
            )
            tree = ckptr.restore(path, abstract)
        else:
            tree = ckptr.restore(path)
    with open(path + ".meta.json", "r", encoding="utf-8") as f:
        sidecar = json.load(f)
    return tree, model_config_from_dict(sidecar["config"]), sidecar["meta"]


def load_checkpoint_meta(base_dir: str, name: str) -> Dict[str, Any]:
    """Sidecar metadata only (epoch, best acc, history, run provenance like
    the --synthetic dataset spec) — no tensor restore."""
    path = _ckpt_dir(base_dir, name)
    _recover(path)
    with open(path + ".meta.json", "r", encoding="utf-8") as f:
        return json.load(f)["meta"]


def save_best_copy(base_dir: str, src_name: str = "latest",
                   best_name: str = "best_model") -> None:
    """Copy the latest checkpoint as best (reference: training/train.py:297-300),
    crash-safely: copy to a temp dir, then swap in with renames so the
    previous best stays readable throughout."""
    src, dst = _ckpt_dir(base_dir, src_name), _ckpt_dir(base_dir, best_name)
    if jax.process_index() == 0:  # host-side copy: primary-only on pods
        tmp = dst + ".tmp"
        for p in (tmp, tmp + ".meta.json"):
            _remove(p)
        try:
            shutil.copytree(src, tmp)
            shutil.copyfile(src + ".meta.json", tmp + ".meta.json")
            _swap_into_place(tmp, dst)
        finally:
            for p in (tmp, tmp + ".meta.json"):
                _remove(p)
    _barrier("vqa-ckpt-best-copy")


def checkpoint_exists(base_dir: str, name: str) -> bool:
    _recover(_ckpt_dir(base_dir, name))
    return os.path.exists(_ckpt_dir(base_dir, name)) and os.path.exists(
        _ckpt_dir(base_dir, name) + ".meta.json"
    )


def load_model_for_inference(base_dir: str, name: str = "best_model",
                             dtype=None):
    """Model-only load reconstructing the architecture from the embedded
    config (reference: models/vqa_model.py:410-432). Returns
    (model, {'params', 'batch_stats'}). ``dtype`` sets the compute dtype
    (params stay f32); default f32."""
    from vqa_tpu.models import create_vqa_model

    path = _ckpt_dir(base_dir, name)
    _recover(path)
    with open(path + ".meta.json", "r", encoding="utf-8") as f:
        sidecar = json.load(f)
    cfg = model_config_from_dict(sidecar["config"])
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    import jax.numpy as _jnp

    model = create_vqa_model(config=cfg, dtype=dtype or _jnp.float32)
    variables = {
        "params": tree["params"],
        "batch_stats": tree["batch_stats"],
    }
    return model, variables
