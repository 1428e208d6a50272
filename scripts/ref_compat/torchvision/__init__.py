"""Minimal torchvision stand-in so the REFERENCE code at /root/reference
can run in this image (torchvision is not installed here).

Only the surface the reference's data/preprocess.py touches is provided
(reference: data/preprocess.py:20,67-120): transforms.{Compose, Resize,
RandomCrop, RandomHorizontalFlip, ColorJitter, ToTensor, Normalize}.
Implemented independently from the documented torchvision semantics with
PIL + torch. Used ONLY by the head-to-head training-parity harness
(scripts/head_to_head.py), which disables augmentation anyway — the
deterministic ops (Resize/ToTensor/Normalize) match torchvision's PIL
path exactly (PIL bilinear resize, /255, (x-mean)/std).
"""

from . import transforms  # noqa: F401
