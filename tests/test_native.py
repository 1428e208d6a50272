"""Native C++ preprocessing library: bit-parity with PIL + fallback wiring.

The native resampler (vqa_tpu/native/vqa_preprocess.cc) must be BIT-IDENTICAL to
PIL's Image.resize(..., BILINEAR) — the same algorithm the reference's
torchvision transform dispatches to (reference: data/preprocess.py:98-121) —
so switching the serving/data path onto it can never change model inputs.
"""

import numpy as np
import pytest
from PIL import Image

from vqa_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler)"
)

RNG = np.random.default_rng(1234)


@pytest.mark.parametrize(
    "sh,sw,dh,dw",
    [
        (480, 640, 224, 224),   # classic COCO downscale
        (224, 224, 224, 224),   # identity
        (100, 150, 224, 224),   # upscale
        (37, 501, 224, 224),    # extreme aspect ratio
        (300, 300, 7, 13),      # aggressive downscale, non-square target
        (224, 224, 256, 256),   # train-path resize S+32
        (1, 1, 224, 224),       # degenerate single pixel
    ],
)
def test_resize_bit_parity_with_pil(sh, sw, dh, dw):
    img = RNG.integers(0, 256, size=(sh, sw, 3), dtype=np.uint8)
    ref = np.asarray(Image.fromarray(img).resize((dw, dh), Image.BILINEAR))
    got = native.resize_bilinear(img, dh, dw)
    assert got.shape == (dh, dw, 3)
    np.testing.assert_array_equal(got, ref)


def test_resize_batch_matches_single():
    imgs = [
        RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for h, w in [(480, 640), (123, 456), (224, 224), (640, 480)]
    ]
    batch = native.resize_bilinear_batch(imgs, 224, 224, num_threads=4)
    assert batch.shape == (4, 224, 224, 3)
    for i, img in enumerate(imgs):
        np.testing.assert_array_equal(
            batch[i], native.resize_bilinear(img, 224, 224)
        )


def test_normalize_f32_matches_numpy():
    from vqa_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize_image

    img = RNG.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    got = native.normalize_f32(img, IMAGENET_MEAN, IMAGENET_STD)
    np.testing.assert_allclose(got, normalize_image(img), rtol=0, atol=1e-5)


def test_resize_to_uint8_uses_same_semantics_either_path():
    """The public preprocess helper must give identical output whether the
    native path is taken or the PIL fallback."""
    from vqa_tpu.data.preprocess import resize_to_uint8, resize_image, load_image, to_uint8

    img = RNG.integers(0, 256, size=(300, 400, 3), dtype=np.uint8)
    via_helper = resize_to_uint8(img, 224)
    via_pil = to_uint8(resize_image(load_image(img), 224))
    np.testing.assert_array_equal(via_helper, via_pil)


def test_engine_batch_preprocess_shapes():
    from vqa_tpu.data.preprocess import resize_batch_to_uint8

    imgs = [
        RNG.integers(0, 256, size=(480, 640, 3), dtype=np.uint8),
        RNG.integers(0, 256, size=(64, 64, 3), dtype=np.uint8),
    ]
    out = resize_batch_to_uint8(imgs, 224)
    assert out.shape == (2, 224, 224, 3)
    assert out.dtype == np.uint8
