"""TensorBoard scalar logging — makes ``log_dir`` real.

The reference configures a ``log_dir`` (reference: utils/config.py:44) and
lists tensorboard as an optional dependency (reference: requirements.txt:28)
but never writes to it (SURVEY.md §5). Here ``--log-dir`` actually produces
TensorBoard event files: per-epoch train/val loss, top-1/top-5 accuracy, and
learning rate, viewable with ``tensorboard --logdir <dir>`` alongside the
device traces that ``--profile-dir`` dumps.

Import-gated: prefers ``tensorboardX`` (no torch import), falls back to
``torch.utils.tensorboard``, degrades to a JSONL scalar log when neither is
installed — training never fails because a viewer library is missing.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional


class ScalarWriter:
    """Per-epoch scalar logger: TensorBoard events when available, JSONL
    (``scalars.jsonl``, one ``{"step": N, "tag": ..., "value": ...}`` per
    line) otherwise. ``backend`` reports which path is active."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._writer = None
        self._jsonl = None
        self.backend = "jsonl"
        for mod, attr in (
            ("tensorboardX", "SummaryWriter"),
            ("torch.utils.tensorboard", "SummaryWriter"),
        ):
            try:
                import importlib

                cls = getattr(importlib.import_module(mod), attr)
                self._writer = cls(log_dir)
                self.backend = mod
                break
            except Exception:
                continue
        if self._writer is None:
            self._jsonl = open(
                os.path.join(log_dir, "scalars.jsonl"), "a", buffering=1
            )

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        for tag, value in scalars.items():
            v = float(value)
            if self._writer is not None:
                self._writer.add_scalar(tag, v, step)
            else:
                self._jsonl.write(
                    json.dumps({"step": int(step), "tag": tag, "value": v})
                    + "\n"
                )
        if self._writer is not None and hasattr(self._writer, "flush"):
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
        if self._jsonl is not None:
            self._jsonl.close()


def maybe_scalar_writer(log_dir: Optional[str]) -> Optional[ScalarWriter]:
    """None-safe factory: no log_dir → no writer, zero overhead."""
    return ScalarWriter(log_dir) if log_dir else None
