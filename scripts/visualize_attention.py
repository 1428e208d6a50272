"""Render cross-attention heatmaps for a (checkpoint, image, question).

Exercises the visualization surface (models.vqa_model.get_attention_maps →
fusion.attention_visualization, mirroring the reference's
models/vqa_model.py:341-369 + models/fusion.py:338-363): the question's
token-averaged attention over the 7×7 image grid is upsampled and blended
over the input image, one PNG per cross-attention layer.

Usage:
    python scripts/visualize_attention.py \
        --checkpoint-dir /tmp/syn_ckpt --image scene.jpg \
        --question "what color is the circle" --out /tmp/attn
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vqa_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

from vqa_tpu.data.preprocess import device_normalize, resize_to_uint8  # noqa: E402
from vqa_tpu.models import get_attention_maps  # noqa: E402
from vqa_tpu.training.checkpoint import load_model_for_inference  # noqa: E402
from vqa_tpu.utils.tokenizer import Tokenizer  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--checkpoint", default="best_model")
    p.add_argument("--image", required=True)
    p.add_argument("--question", required=True)
    p.add_argument("--out", default="attention_maps")
    args = p.parse_args()

    model, variables = load_model_for_inference(
        args.checkpoint_dir, args.checkpoint
    )
    tokenizer = Tokenizer(max_length=model.config.max_question_length)
    tok_path = os.path.join(args.checkpoint_dir, "tokenizer.json")
    if os.path.exists(tok_path):
        tokenizer.load(tok_path)
    else:
        tokenizer.build_vocab([args.question], min_freq=1)

    size = model.config.image_size
    pixels = resize_to_uint8(args.image, size)
    ids, mask = tokenizer.encode_batch_np([args.question])
    images = device_normalize(jnp.asarray(pixels[None]))
    maps = get_attention_maps(
        model, variables, images, jnp.asarray(ids), jnp.asarray(mask)
    )
    valid = np.asarray(mask)[0].astype(bool)
    s = model.config.feature_spatial_size
    # per-layer raw weights [B,H,L_q,L_kv] plus the layer+head average
    # the viz helper produces ([B,L_q,s,s], reference: models/fusion.py:338-363)
    heats = {}
    for layer, w in enumerate(maps["cross_attention"]):
        w = np.asarray(w)[0].mean(0).reshape(-1, s, s)  # [L_q, s, s]
        heats[f"layer{layer}"] = w[valid].mean(0)
    heats["mean"] = np.asarray(maps["cross_attention_spatial"])[0][valid].mean(0)

    os.makedirs(args.out, exist_ok=True)
    base = Image.fromarray(pixels).convert("RGB")
    for name, heat in heats.items():
        heat = (heat - heat.min()) / max(heat.max() - heat.min(), 1e-9)
        heat_img = Image.fromarray(
            (heat * 255).astype(np.uint8)
        ).resize((size, size), Image.BILINEAR)
        overlay = np.asarray(base, np.float32)
        h = np.asarray(heat_img, np.float32)[..., None] / 255.0
        red = np.zeros_like(overlay)
        red[..., 0] = 255
        blended = (overlay * (1 - 0.6 * h) + red * 0.6 * h).astype(np.uint8)
        path = os.path.join(args.out, f"cross_attention_{name}.png")
        Image.fromarray(blended).save(path)
        print(f"wrote {path} (peak cell: {np.unravel_index(heat.argmax(), heat.shape)})")
    return 0


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    os._exit(rc)  # axon tunnel teardown can hang the interpreter
