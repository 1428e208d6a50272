"""One-way PyTorch → JAX weight importer.

Maps a reference checkpoint's ``state_dict``
(reference: training/train.py:280-294 checkpoint schema;
models/vqa_model.py:107-241 module tree) onto this framework's flax
variable tree, handling the layout differences:

- Conv2d OIHW → flax HWIO kernel transpose
- Linear [out,in] → flax Dense [in,out] kernel transpose
- BatchNorm weight/bias → scale/bias params; running_mean/var → batch_stats
- Embedding copied as-is; sinusoidal PE buffer skipped (recomputed)
- position_embedding [1,49,D] copied as-is (NHWC token order matches the
  reference's NCHW flatten order p = h·W + w, see models/fusion.py docstring)

Works on plain numpy arrays so torch is only needed to *read* .pth files
(``load_torch_checkpoint``), not to convert.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor
    return x.detach().cpu().numpy()


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW → HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    """[out, in] → [in, out]."""
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STAT = {"running_mean": "mean", "running_var": "var"}
_LN_PARAM = {"weight": "scale", "bias": "bias"}


def _map_key(key: str):
    """Return (collection, flax_path, transform) for one state_dict key, or
    None to skip (buffers like num_batches_tracked, PE table)."""
    parts = key.split(".")

    def bn(prefix: Tuple[str, ...], leaf: str):
        if leaf in _BN_PARAM:
            return "params", prefix + (_BN_PARAM[leaf],), None
        if leaf in _BN_STAT:
            return "batch_stats", prefix + (_BN_STAT[leaf],), None
        return None  # num_batches_tracked

    # ---------------- image encoder ----------------
    if parts[0] == "image_encoder":
        rest = parts[1:]
        if rest[0] == "stem":
            idx, leaf = rest[1], rest[2]
            if idx == "0":
                return "params", ("image_encoder", "stem_conv", "kernel"), _conv_kernel
            if idx == "1":
                return bn(("image_encoder", "stem_bn"), leaf)
            return None
        m = re.match(r"stage(\d)", rest[0])
        if m:
            stage = rest[0]
            if rest[1] == "blocks":
                block = f"block{rest[2]}"
                sub = rest[3]
                base = ("image_encoder", stage, block)
                if sub in ("conv1", "conv2"):
                    return "params", base + (sub, "kernel"), _conv_kernel
                if sub in ("bn1", "bn2"):
                    return bn(base + (sub,), rest[4])
                if sub == "downsample":
                    if rest[4] == "0":
                        return "params", base + ("down_conv", "kernel"), _conv_kernel
                    return bn(base + ("down_bn",), rest[5])
            if rest[1] == "attention":
                base = ("image_encoder", stage, "attention")
                if rest[2] == "se":
                    return (
                        "params",
                        base + ("se", rest[3], "kernel"),
                        _linear_kernel,
                    )
                if rest[2] == "spatial":
                    return "params", base + ("spatial", "conv", "kernel"), _conv_kernel
        return None

    # ---------------- text encoder ----------------
    if parts[0] == "text_encoder":
        rest = parts[1:]
        if rest[0] == "token_embedding":
            return "params", ("text_encoder", "token_embedding", "embedding"), None
        if rest[0] == "positional_encoding":
            return None  # recomputed sinusoidal table
        if rest[0] == "final_norm":
            return "params", ("text_encoder", "final_norm", _LN_PARAM[rest[1]]), None
        if rest[0] == "layers":
            layer = f"layer{rest[1]}"
            sub = rest[2]
            base = ("text_encoder", layer)
            if sub == "self_attention":
                return "params", base + ("self_attention", rest[3], "kernel"), _linear_kernel
            if sub in ("norm1", "norm2"):
                return "params", base + (sub, _LN_PARAM[rest[3]]), None
            if sub == "ffn":
                fc, leaf = rest[3], rest[4]
                t = _linear_kernel if leaf == "weight" else None
                flax_leaf = "kernel" if leaf == "weight" else "bias"
                return "params", base + ("ffn", fc, flax_leaf), t
        return None

    # ---------------- fusion ----------------
    if parts[0] == "fusion":
        rest = parts[1:]
        base = ("fusion",)
        if rest[0] == "image_projector":
            if rest[1] == "projection":
                idx, leaf = rest[2], rest[3]
                if idx == "0":
                    t = _linear_kernel if leaf == "weight" else None
                    flax_leaf = "kernel" if leaf == "weight" else "bias"
                    return "params", base + ("image_projector", "proj", flax_leaf), t
                if idx == "1":
                    return "params", base + (
                        "image_projector", "proj_norm", _LN_PARAM[leaf]), None
            if rest[1] == "position_embedding":
                return "params", base + ("image_projector", "position_embedding"), None
        if rest[0] == "cross_attention":
            layer = f"layer{rest[2]}"
            sub = rest[3]
            lbase = base + ("cross_attention", layer)
            if sub in ("norm_query", "norm_kv", "norm_ffn"):
                return "params", lbase + (sub, _LN_PARAM[rest[4]]), None
            if sub == "cross_attention":
                return "params", lbase + ("cross_attention", rest[4], "kernel"), _linear_kernel
            if sub == "ffn":
                idx, leaf = rest[4], rest[5]
                fc = {"0": "ffn_fc1", "3": "ffn_fc2"}[idx]
                t = _linear_kernel if leaf == "weight" else None
                flax_leaf = "kernel" if leaf == "weight" else "bias"
                return "params", lbase + (fc, flax_leaf), t
        if rest[0] == "gate":
            # gate.gate.0.{weight,bias}
            leaf = rest[3]
            t = _linear_kernel if leaf == "weight" else None
            flax_leaf = "kernel" if leaf == "weight" else "bias"
            return "params", base + ("gate", "gate", flax_leaf), t
        if rest[0] == "output_norm":
            return "params", base + ("output_norm", _LN_PARAM[rest[1]]), None
        return None

    # ---------------- answer head ----------------
    if parts[0] == "answer_head":
        # classifier.{0,3,6}.{weight,bias}
        idx, leaf = parts[2], parts[3]
        fc = {"0": "fc1", "3": "fc2", "6": "fc3"}[idx]
        t = _linear_kernel if leaf == "weight" else None
        flax_leaf = "kernel" if leaf == "weight" else "bias"
        return "params", ("answer_head", fc, flax_leaf), t

    return None


def convert_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a reference VQAModel state_dict to flax variables
    ``{'params': ..., 'batch_stats': ...}`` (plain nested dicts of numpy)."""
    params: dict = {}
    batch_stats: dict = {}
    unmapped = []
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        mapped = _map_key(key)
        if mapped is None:
            if "positional_encoding" not in key:
                unmapped.append(key)
            continue
        collection, path, transform = mapped
        arr = _np(value).astype(np.float32)
        if transform is not None:
            arr = transform(arr)
        _set(params if collection == "params" else batch_stats, path, arr)
    if unmapped:
        raise ValueError(f"Unmapped state_dict keys: {unmapped[:10]}")
    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(checkpoint_path: str, _ckpt=None):
    """Read a reference .pth checkpoint → (flax variables, ModelConfig).

    Handles the reference checkpoint schema
    (training/train.py:280-294): ``model_state_dict`` + embedded ``config``.
    ``_ckpt`` lets a caller that already torch.loaded the file skip a second
    deserialization of a potentially large pickle.
    """
    from vqa_tpu.utils.config import ModelConfig

    if _ckpt is None:
        import torch

        _ckpt = torch.load(
            checkpoint_path, map_location="cpu", weights_only=False
        )
    ckpt = _ckpt
    state_dict = ckpt.get("model_state_dict", ckpt)
    ref_cfg = ckpt.get("config", {}) if isinstance(ckpt, dict) else {}
    cfg = ModelConfig(
        vocab_size=ref_cfg.get("vocab_size", 10000),
        embed_dim=ref_cfg.get("embed_dim", 256),
        num_answers=ref_cfg.get("num_answers", 1000),
        use_se_attention=ref_cfg.get("use_se_attention", True),
        use_spatial_attention=ref_cfg.get("use_spatial_attention", True),
        se_reduction=ref_cfg.get("se_reduction", 16),
        num_transformer_layers=ref_cfg.get("num_transformer_layers", 4),
        num_attention_heads=ref_cfg.get("num_attention_heads", 8),
        ffn_hidden_dim=ref_cfg.get("ffn_hidden_dim", 1024),
        max_question_length=ref_cfg.get("max_question_length", 20),
        num_cross_layers=ref_cfg.get("num_cross_layers", 2),
        use_gating=ref_cfg.get("use_gating", True),
        dropout=ref_cfg.get("dropout", 0.1),
        answer_dropout=ref_cfg.get("answer_dropout", 0.3),
    )
    return convert_torch_state_dict(state_dict), cfg


def import_checkpoint_to_dir(
    pth_path: str,
    out_dir: str,
    names=("best_model", "latest"),
) -> None:
    """Convert a reference .pth into a framework checkpoint directory.

    Writes an Orbax checkpoint containing ``{params, batch_stats}`` plus a
    sidecar flagged ``model_only`` (no optimizer state exists in a converted
    checkpoint — ``Trainer.resume`` detects the flag and continues with a
    fresh optimizer). Both ``best_model`` and ``latest`` are written by
    default so eval (best→latest fallback), serving, and ``--resume`` all
    find it.
    """
    import torch

    from vqa_tpu.training.checkpoint import save_checkpoint

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    variables, cfg = load_torch_checkpoint(pth_path, _ckpt=ckpt)
    meta = {
        "epoch": int(ckpt.get("epoch", 0)) if isinstance(ckpt, dict) else 0,
        "best_val_accuracy": float(ckpt.get("best_val_accuracy", 0.0))
        if isinstance(ckpt, dict)
        else 0.0,
        "metrics_history": ckpt.get("metrics_history", {})
        if isinstance(ckpt, dict)
        else {},
        "model_only": True,
        "imported_from": pth_path,
    }
    tree = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }
    for name in names:
        save_checkpoint(out_dir, name, tree, cfg, meta)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Convert a reference PyTorch .pth checkpoint into a "
        "vqa_tpu checkpoint directory (usable by evaluate, serving, and "
        "train --resume with a fresh optimizer)."
    )
    p.add_argument("--pth", required=True, help="reference .pth checkpoint")
    p.add_argument("--out-dir", required=True)
    p.add_argument(
        "--name",
        default=None,
        choices=[None, "best_model", "latest"],
        help="write only this checkpoint name (default: both)",
    )
    args = p.parse_args(argv)
    names = (args.name,) if args.name else ("best_model", "latest")
    import_checkpoint_to_dir(args.pth, args.out_dir, names=names)
    print(f"[import] {args.pth} → {args.out_dir} ({', '.join(names)})")


if __name__ == "__main__":
    main()
