"""Interop with the PyTorch reference implementation.

- ``torch_import``: reference .pth → flax variables (one-way importer).
- ``torch_export``: flax variables → reference .pth (one-way exporter);
  also a CLI: ``python -m vqa_tpu.compat.torch_export``.

Both are lazy imports so ``vqa_tpu.compat`` stays importable without torch
(torch is only needed to read/write .pth files, not to convert).
"""

__all__ = [
    "convert_torch_state_dict",
    "load_torch_checkpoint",
    "flax_to_torch_state_dict",
    "save_torch_checkpoint",
    "export_checkpoint_dir",
]


def __getattr__(name):
    if name in ("convert_torch_state_dict", "load_torch_checkpoint"):
        from vqa_tpu.compat import torch_import

        return getattr(torch_import, name)
    if name in (
        "flax_to_torch_state_dict",
        "save_torch_checkpoint",
        "export_checkpoint_dir",
    ):
        from vqa_tpu.compat import torch_export

        return getattr(torch_export, name)
    raise AttributeError(name)
