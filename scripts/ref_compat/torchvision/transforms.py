"""PIL/torch implementations of the transforms the reference uses."""

from __future__ import annotations

import random

import numpy as np
import torch
from PIL import Image, ImageEnhance


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class Resize:
    """size=(h, w) → PIL bilinear resize (torchvision's PIL default)."""

    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img: Image.Image) -> Image.Image:
        h, w = self.size
        return img.resize((w, h), Image.BILINEAR)


class RandomCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img: Image.Image) -> Image.Image:
        h, w = self.size
        top = random.randint(0, max(img.height - h, 0))
        left = random.randint(0, max(img.width - w, 0))
        return img.crop((left, top, left + w, top + h))


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img: Image.Image) -> Image.Image:
        if random.random() < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img


class ColorJitter:
    """Brightness/contrast/saturation/hue jitter in random order."""

    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    @staticmethod
    def _factor(amount: float) -> float:
        return random.uniform(max(0.0, 1.0 - amount), 1.0 + amount)

    def __call__(self, img: Image.Image) -> Image.Image:
        ops = []
        if self.brightness:
            f = self._factor(self.brightness)
            ops.append(lambda im: ImageEnhance.Brightness(im).enhance(f))
        if self.contrast:
            f = self._factor(self.contrast)
            ops.append(lambda im: ImageEnhance.Contrast(im).enhance(f))
        if self.saturation:
            f = self._factor(self.saturation)
            ops.append(lambda im: ImageEnhance.Color(im).enhance(f))
        if self.hue:
            shift = random.uniform(-self.hue, self.hue)

            def _hue(im: Image.Image, shift=shift) -> Image.Image:
                hsv = np.asarray(im.convert("HSV"), np.uint8).copy()
                hsv[..., 0] = (
                    hsv[..., 0].astype(np.int16) + int(round(shift * 255))
                ) % 256
                return Image.fromarray(hsv, "HSV").convert("RGB")

            ops.append(_hue)
        random.shuffle(ops)
        for op in ops:
            img = op(img)
        return img


class ToTensor:
    def __call__(self, img: Image.Image) -> torch.Tensor:
        arr = np.asarray(img, np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.copy()).permute(2, 0, 1).float() / 255.0
        return t


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, t: torch.Tensor) -> torch.Tensor:
        return (t - self.mean) / self.std
