"""One-way JAX → PyTorch weight exporter (inverse of torch_import).

Lets a model trained with this framework be handed back to the reference
stack: the emitted checkpoint loads through the reference's
``load_vqa_model`` (reference: models/vqa_model.py:410-432, which calls
``VQAModel(**config)`` then ``load_state_dict`` strict) and its serving /
eval CLIs unchanged.

Layout conversions are the exact inverses of the importer's
(vqa_tpu/compat/torch_import.py):

- flax HWIO conv kernel → Conv2d OIHW
- flax Dense kernel [in,out] → Linear weight [out,in]
- BN scale/bias → weight/bias; batch_stats mean/var → running_mean/var,
  plus a synthesized ``num_batches_tracked`` buffer per BN site
- the sinusoidal ``positional_encoding.pe`` buffer (skipped on import,
  recomputed at trace time here) is synthesized with the reference's
  formula (reference: models/text_encoder.py:75-96) because the torch
  ``state_dict`` contract includes persistent buffers

Pure numpy except for ``save_torch_checkpoint`` (which needs torch only to
*write* the .pth file).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from vqa_tpu.utils.config import ModelConfig


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """HWIO → OIHW."""
    return np.transpose(w, (3, 2, 0, 1))


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    """[in, out] → [out, in]."""
    return np.transpose(w, (1, 0))


def sinusoidal_pe(max_length: int, embed_dim: int) -> np.ndarray:
    """The reference's precomputed PE buffer, [1, max_length, embed_dim]
    (reference: models/text_encoder.py:75-96)."""
    position = np.arange(max_length, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, embed_dim, 2, dtype=np.float32)
        * (-np.log(10000.0) / embed_dim)
    )
    pe = np.zeros((max_length, embed_dim), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe[None]


_LN = {"scale": "weight", "bias": "bias"}


def _flatten(tree: dict, prefix: Tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v, np.float32)


def _torch_key(collection: str, path: Tuple[str, ...]) -> Tuple[str, Any]:
    """Map one flax (collection, path) to (torch_key, transform).

    Raises KeyError for unknown paths so structural drift fails loudly.
    """
    top = path[0]

    def bn(torch_prefix: str, leaf: str):
        if collection == "batch_stats":
            return f"{torch_prefix}.running_{'mean' if leaf == 'mean' else 'var'}", None
        return f"{torch_prefix}.{_LN[leaf]}", None

    if top == "image_encoder":
        rest = path[1:]
        if rest[0] == "stem_conv":
            return "image_encoder.stem.0.weight", _conv_kernel
        if rest[0] == "stem_bn":
            return bn("image_encoder.stem.1", rest[1])
        stage = rest[0]  # stage1..stage4
        if rest[1] == "attention":
            if rest[2] == "se":
                return (
                    f"image_encoder.{stage}.attention.se.{rest[3]}.weight",
                    _linear_kernel,
                )
            if rest[2] == "spatial":
                return (
                    f"image_encoder.{stage}.attention.spatial.conv.weight",
                    _conv_kernel,
                )
        if rest[1].startswith("block"):
            b = rest[1][len("block"):]
            base = f"image_encoder.{stage}.blocks.{b}"
            sub = rest[2]
            if sub in ("conv1", "conv2"):
                return f"{base}.{sub}.weight", _conv_kernel
            if sub in ("bn1", "bn2"):
                return bn(f"{base}.{sub}", rest[3])
            if sub == "down_conv":
                return f"{base}.downsample.0.weight", _conv_kernel
            if sub == "down_bn":
                return bn(f"{base}.downsample.1", rest[3])

    if top == "text_encoder":
        rest = path[1:]
        if rest[0] == "token_embedding":
            return "text_encoder.token_embedding.weight", None
        if rest[0] == "final_norm":
            return f"text_encoder.final_norm.{_LN[rest[1]]}", None
        if rest[0].startswith("layer"):
            i = rest[0][len("layer"):]
            base = f"text_encoder.layers.{i}"
            sub = rest[1]
            if sub == "self_attention":
                return f"{base}.self_attention.{rest[2]}.weight", _linear_kernel
            if sub in ("norm1", "norm2"):
                return f"{base}.{sub}.{_LN[rest[2]]}", None
            if sub == "ffn":
                fc, leaf = rest[2], rest[3]
                if leaf == "kernel":
                    return f"{base}.ffn.{fc}.weight", _linear_kernel
                return f"{base}.ffn.{fc}.bias", None

    if top == "fusion":
        rest = path[1:]
        if rest[0] == "image_projector":
            if rest[1] == "proj":
                if rest[2] == "kernel":
                    return "fusion.image_projector.projection.0.weight", _linear_kernel
                return "fusion.image_projector.projection.0.bias", None
            if rest[1] == "proj_norm":
                return f"fusion.image_projector.projection.1.{_LN[rest[2]]}", None
            if rest[1] == "position_embedding":
                return "fusion.image_projector.position_embedding", None
        if rest[0] == "cross_attention":
            i = rest[1][len("layer"):]
            base = f"fusion.cross_attention.layers.{i}"
            sub = rest[2]
            if sub in ("norm_query", "norm_kv", "norm_ffn"):
                return f"{base}.{sub}.{_LN[rest[3]]}", None
            if sub == "cross_attention":
                return f"{base}.cross_attention.{rest[3]}.weight", _linear_kernel
            if sub in ("ffn_fc1", "ffn_fc2"):
                idx = "0" if sub == "ffn_fc1" else "3"
                if rest[3] == "kernel":
                    return f"{base}.ffn.{idx}.weight", _linear_kernel
                return f"{base}.ffn.{idx}.bias", None
        if rest[0] == "gate":
            # flax fusion/gate/gate/{kernel,bias} → fusion.gate.gate.0.*
            if rest[2] == "kernel":
                return "fusion.gate.gate.0.weight", _linear_kernel
            return "fusion.gate.gate.0.bias", None
        if rest[0] == "output_norm":
            return f"fusion.output_norm.{_LN[rest[1]]}", None

    if top == "answer_head":
        fc, leaf = path[1], path[2]
        idx = {"fc1": "0", "fc2": "3", "fc3": "6"}[fc]
        if leaf == "kernel":
            return f"answer_head.classifier.{idx}.weight", _linear_kernel
        return f"answer_head.classifier.{idx}.bias", None

    raise KeyError(f"no torch mapping for {collection}:{'/'.join(path)}")


def flax_to_torch_state_dict(
    variables: Dict[str, Any], config: ModelConfig
) -> Dict[str, np.ndarray]:
    """Convert flax ``{'params', 'batch_stats'}`` variables to a reference
    state_dict of numpy arrays (torch-free; tensors created only at save)."""
    out: Dict[str, np.ndarray] = {}
    for collection in ("params", "batch_stats"):
        for path, arr in _flatten(variables.get(collection, {})):
            key, transform = _torch_key(collection, path)
            out[key] = transform(arr) if transform is not None else arr
    # synthesized persistent buffers the strict load_state_dict expects
    out["text_encoder.positional_encoding.pe"] = sinusoidal_pe(
        config.max_question_length, config.embed_dim
    )
    for key in list(out):
        if key.endswith("running_mean"):
            out[key[: -len("running_mean")] + "num_batches_tracked"] = np.asarray(
                0, np.int64
            )
    return out


def save_torch_checkpoint(
    variables: Dict[str, Any],
    config: ModelConfig,
    path: str,
    epoch: int = 0,
    best_val_accuracy: float = 0.0,
    metrics_history: Optional[dict] = None,
) -> None:
    """Write a reference-schema .pth checkpoint
    (reference: training/train.py:280-294): ``model_state_dict`` +
    ``config`` (the exact ``VQAModel(**config)`` kwarg dict,
    reference: models/vqa_model.py:226-241) + bookkeeping fields."""
    import torch

    state_dict = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in flax_to_torch_state_dict(variables, config).items()
    }
    ref_config = {
        "vocab_size": config.vocab_size,
        "embed_dim": config.embed_dim,
        "num_answers": config.num_answers,
        "use_se_attention": config.use_se_attention,
        "use_spatial_attention": config.use_spatial_attention,
        "se_reduction": config.se_reduction,
        "num_transformer_layers": config.num_transformer_layers,
        "num_attention_heads": config.num_attention_heads,
        "ffn_hidden_dim": config.ffn_hidden_dim,
        "max_question_length": config.max_question_length,
        "num_cross_layers": config.num_cross_layers,
        "use_gating": config.use_gating,
        "dropout": config.dropout,
        "answer_dropout": config.answer_dropout,
    }
    torch.save(
        {
            "epoch": epoch,
            "model_state_dict": state_dict,
            "optimizer_state_dict": {},
            "scheduler_state_dict": {},
            "best_val_accuracy": best_val_accuracy,
            "config": ref_config,
            "metrics_history": metrics_history or {},
        },
        path,
    )


def export_checkpoint_dir(
    checkpoint_dir: str, out_path: str, which: str = "best_model"
) -> None:
    """Export a framework checkpoint directory (Orbax + sidecar) straight
    to a reference .pth. ``which`` is 'best_model' or 'latest'."""
    from vqa_tpu.training.checkpoint import (
        load_checkpoint_meta,
        load_model_for_inference,
    )

    model, variables = load_model_for_inference(checkpoint_dir, name=which)
    meta = load_checkpoint_meta(checkpoint_dir, which)
    save_torch_checkpoint(
        variables,
        model.config,
        out_path,
        epoch=int(meta.get("epoch", 0)),
        best_val_accuracy=float(meta.get("best_val_accuracy", 0.0)),
        metrics_history=meta.get("metrics_history") or {},
    )


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Export a vqa_tpu checkpoint directory to a reference-"
        "compatible PyTorch .pth (loads via the reference's load_vqa_model)."
    )
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument(
        "--which",
        default="best_model",
        choices=["best_model", "latest"],
        help="which checkpoint in the directory to export",
    )
    args = p.parse_args(argv)
    export_checkpoint_dir(args.checkpoint_dir, args.out, which=args.which)
    print(f"[export] {args.which} from {args.checkpoint_dir} → {args.out}")


if __name__ == "__main__":
    main()
