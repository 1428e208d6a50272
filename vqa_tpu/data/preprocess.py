"""Image & question preprocessing.

Mirrors the reference pipeline semantics (reference: data/preprocess.py):
- val/inference: PIL bilinear resize to (S,S) → [0,1] → ImageNet normalize
- train: resize (S+32,S+32) → random crop S → h-flip p=.5 → color jitter
  (brightness/contrast/saturation 0.2, hue 0.1) → normalize

TPU-first differences:
- no torchvision/torch: PIL for decode+resize (bit-identical resize to the
  reference, which also uses PIL under torchvision), numpy for the rest;
- the normalize step can run **on device** inside the jitted program
  (``device_normalize``): the host ships uint8 pixels (4× less PCIe/ICI
  traffic than f32) and XLA fuses /255, mean/std into the first conv's
  prologue. Host-side ``normalize_image`` exists for the parity path.
- augmentation uses an explicit ``np.random.Generator`` (seeded,
  reproducible — the reference relies on global torch RNG state).
"""

from __future__ import annotations

import io
from typing import Sequence, Tuple, Union

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

ImageInput = Union[str, bytes, Image.Image, np.ndarray]


# ---------------------------------------------------------------------------
# Decode / resize (host; PIL — matches reference bilinear semantics)
# ---------------------------------------------------------------------------

def load_image(image: ImageInput) -> Image.Image:
    """Open path/bytes/PIL/array as an RGB PIL image
    (reference: data/preprocess.py:146-227 input handling)."""
    if isinstance(image, Image.Image):
        img = image
    elif isinstance(image, bytes):
        img = Image.open(io.BytesIO(image))
    elif isinstance(image, np.ndarray):
        img = Image.fromarray(image)
    else:
        img = Image.open(image)
    return img.convert("RGB")


def resize_image(img: Image.Image, size: int) -> Image.Image:
    """Resize to (size, size) with bilinear interpolation — identical to the
    reference's torchvision Resize((S,S)) which defaults to PIL bilinear."""
    return img.resize((size, size), Image.BILINEAR)


def to_uint8(img: Image.Image) -> np.ndarray:
    """PIL → [H, W, 3] uint8 array (NHWC, TPU-native layout)."""
    return np.asarray(img, dtype=np.uint8)


def resize_to_uint8(image: ImageInput, size: int) -> np.ndarray:
    """Decode → RGB → bilinear resize (size,size) → [H,W,3] u8.

    Uses the native C++ resampler (vqa_tpu.native, bit-identical to PIL
    BILINEAR — asserted in tests/test_native.py) when available, else PIL.
    """
    from vqa_tpu import native

    pil = load_image(image)
    if native.available():
        return native.resize_bilinear(np.asarray(pil, np.uint8), size, size)
    return to_uint8(resize_image(pil, size))


def resize_batch_to_uint8(images: Sequence[ImageInput], size: int) -> np.ndarray:
    """Decode + resize a batch → [N,size,size,3] u8; the native path resizes
    across a thread pool (serving/data-loading hot path)."""
    from vqa_tpu import native

    pils = [load_image(im) for im in images]
    if native.available():
        return native.resize_bilinear_batch(
            [np.asarray(p, np.uint8) for p in pils], size, size
        )
    out = np.empty((len(pils), size, size, 3), np.uint8)
    for i, p in enumerate(pils):
        out[i] = to_uint8(resize_image(p, size))
    return out


# ---------------------------------------------------------------------------
# Normalization — host path (parity) and values for the device path
# ---------------------------------------------------------------------------

def normalize_image(x: np.ndarray) -> np.ndarray:
    """[H,W,3] uint8 or [0,1] float → ImageNet-normalized float32."""
    if x.dtype == np.uint8:
        x = x.astype(np.float32) / 255.0
    return (x.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_image(x: np.ndarray) -> np.ndarray:
    """Inverse of normalize_image → [0,1] float
    (reference: data/preprocess.py:198-227)."""
    return np.clip(x * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)


def device_normalize(pixels_uint8):
    """Jittable on-device uint8 → normalized f32 (NHWC).

    Intended to be the first op of the inference XLA program so the /255
    and mean/std get fused into the stem conv.
    """
    import jax.numpy as jnp

    x = pixels_uint8.astype(jnp.float32) * (1.0 / 255.0)
    mean = jnp.asarray(IMAGENET_MEAN)
    std_inv = jnp.asarray(1.0 / IMAGENET_STD)
    return (x - mean) * std_inv


# ---------------------------------------------------------------------------
# Full preprocessing paths
# ---------------------------------------------------------------------------

def preprocess_image(
    image: ImageInput, image_size: int = 224, normalize: bool = True
) -> np.ndarray:
    """Val/inference path: resize (S,S) → normalize → [H,W,3] f32 (NHWC)
    (reference: data/preprocess.py:98-121,146-176). The resize goes through
    the native C++ resampler when available (bit-identical to PIL)."""
    arr = resize_to_uint8(image, image_size)
    return normalize_image(arr) if normalize else arr


def preprocess_image_bytes(data: bytes, image_size: int = 224) -> np.ndarray:
    """Bytes → resized uint8 [H,W,3] for the on-device-normalize path
    (reference analog: data/preprocess.py:179-196)."""
    return resize_to_uint8(data, image_size)


def augment_image(
    image: ImageInput,
    rng: np.random.Generator,
    image_size: int = 224,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.1,
) -> np.ndarray:
    """Train path: resize (S+32) → random crop S → h-flip p=.5 → color
    jitter → normalize (reference: data/preprocess.py:38-95; jitter factors
    match, applied in fixed b/c/s/h order instead of torchvision's random
    order — augmentation only, no parity requirement)."""
    x = resize_to_uint8(image, image_size + 32).astype(np.float32) / 255.0

    # random crop
    max_off = x.shape[0] - image_size
    oy, ox = rng.integers(0, max_off + 1, size=2)
    x = x[oy : oy + image_size, ox : ox + image_size]

    # horizontal flip
    if rng.random() < 0.5:
        x = x[:, ::-1]

    # brightness: x * f
    x = x * rng.uniform(1 - brightness, 1 + brightness)
    # contrast: blend with grayscale mean
    f = rng.uniform(1 - contrast, 1 + contrast)
    gray_mean = x.mean()
    x = (x - gray_mean) * f + gray_mean
    # saturation: blend with per-pixel grayscale
    f = rng.uniform(1 - saturation, 1 + saturation)
    gray = x @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    x = (x - gray[..., None]) * f + gray[..., None]
    # hue: rotate chroma around the luma axis (YIQ approximation)
    theta = rng.uniform(-hue, hue) * 2 * np.pi
    yiq = x @ _RGB2YIQ.T
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float32)
    x = (yiq @ rot.T) @ _YIQ2RGB.T

    x = np.clip(x, 0.0, 1.0).astype(np.float32)
    return (x - IMAGENET_MEAN) / IMAGENET_STD


_RGB2YIQ = np.array(
    [[0.299, 0.587, 0.114],
     [0.5959, -0.2746, -0.3213],
     [0.2115, -0.5227, 0.3112]],
    dtype=np.float32,
)
_YIQ2RGB = np.linalg.inv(_RGB2YIQ).astype(np.float32)


def device_augment(
    pixels_u8,
    rng,
    image_size: int = 224,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.1,
):
    """Jittable on-device batch twin of :func:`augment_image`.

    The host has one CPU core here, so per-sample host augmentation would
    starve the TPU; this runs the whole train-time pipeline — random crop
    (S+32)→S, h-flip p=.5, brightness/contrast/saturation/hue jitter (same
    factors and fixed order as the host path, YIQ hue rotation), ImageNet
    normalize — as vectorized device ops inside one XLA program.

    Args:
        pixels_u8: [B, S+32, S+32, 3] uint8 batch (host-resized only).
        rng: jax PRNG key (fold in the step number per batch).
        image_size: S, the output crop size.

    Returns:
        [B, S, S, 3] float32, ImageNet-normalized.
    """
    import jax
    import jax.numpy as jnp

    b, src, _, _ = pixels_u8.shape
    max_off = src - image_size
    k_crop, k_flip, k_b, k_c, k_s, k_h = jax.random.split(rng, 6)

    x = pixels_u8.astype(jnp.float32) * (1.0 / 255.0)

    # random crop: per-sample dynamic_slice under vmap
    offs = jax.random.randint(k_crop, (b, 2), 0, max_off + 1)
    x = jax.vmap(
        lambda img, o: jax.lax.dynamic_slice(
            img, (o[0], o[1], 0), (image_size, image_size, 3)
        )
    )(x, offs)

    # horizontal flip p=.5
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)

    # brightness
    fb = jax.random.uniform(
        k_b, (b, 1, 1, 1), minval=1 - brightness, maxval=1 + brightness
    )
    x = x * fb
    # contrast: blend with per-image mean
    fc = jax.random.uniform(
        k_c, (b, 1, 1, 1), minval=1 - contrast, maxval=1 + contrast
    )
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = (x - mean) * fc + mean
    # saturation: blend with per-pixel grayscale
    fs = jax.random.uniform(
        k_s, (b, 1, 1, 1), minval=1 - saturation, maxval=1 + saturation
    )
    gray = x @ jnp.asarray([0.299, 0.587, 0.114])
    x = (x - gray[..., None]) * fs + gray[..., None]
    # hue: rotate chroma around the luma axis (YIQ), per-sample angle
    theta = jax.random.uniform(
        k_h, (b,), minval=-hue, maxval=hue
    ) * (2 * np.pi)
    c, s = jnp.cos(theta), jnp.sin(theta)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    rot = jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, c, -s], -1),
            jnp.stack([zero, s, c], -1),
        ],
        -2,
    )  # [B, 3, 3]
    m = jnp.einsum("dc,bce->bde", jnp.asarray(_YIQ2RGB), rot) @ jnp.asarray(
        _RGB2YIQ
    )  # combined RGB→RGB per sample
    x = jnp.einsum("bhwc,bdc->bhwd", x, m)

    x = jnp.clip(x, 0.0, 1.0)
    return (x - jnp.asarray(IMAGENET_MEAN)) * jnp.asarray(
        1.0 / IMAGENET_STD
    )


# ---------------------------------------------------------------------------
# Question utils (reference: data/preprocess.py:234-278)
# ---------------------------------------------------------------------------

def normalize_question(q: str) -> str:
    """Display normalization: strip, collapse spaces, ensure trailing '?'."""
    q = " ".join(q.strip().split())
    if q and not q.endswith("?"):
        q += "?"
    return q


def validate_question(q: str, min_words: int = 2) -> Tuple[bool, str]:
    """Minimum-length validation."""
    words = q.strip().split()
    if len(words) < min_words:
        return False, f"Question must have at least {min_words} words"
    return True, ""


# ---------------------------------------------------------------------------
# Collation (reference: data/preprocess.py:285-315)
# ---------------------------------------------------------------------------

def vqa_collate(samples: Sequence[dict]) -> dict:
    """Stack per-sample dicts into fixed-shape batch arrays
    (reference: data/preprocess.py:285-315; the rebuild's loaders collate
    inside BatchLoader, which also pads partial batches — this standalone
    helper mirrors the reference API for custom loaders).

    Image dtype is preserved: uint8 batches signal the Trainer's on-device
    augmentation path."""
    return {
        "image": np.stack([s["image"] for s in samples]),
        "token_ids": np.stack([s["token_ids"] for s in samples]).astype(np.int32),
        "attention_mask": np.stack(
            [s["attention_mask"] for s in samples]
        ).astype(np.int32),
        "answer": np.asarray([s["answer"] for s in samples], dtype=np.int32),
    }
