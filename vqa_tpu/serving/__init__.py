"""Serving layer. Lazy re-exports, like the top-level package: importing
``vqa_tpu.serving`` must NOT pull in jax/flax — the recycle supervisor
(``python -m vqa_tpu.serving.supervisor``) lives here and is a pure-stdlib
monitoring process whose RSS baseline would otherwise carry a full JAX
import it never uses (docs/LEAK_TPU.md)."""

_API = {
    "MicroBatcher": "vqa_tpu.serving.batcher",
    "VQAInference": "vqa_tpu.serving.engine",
    "get_inference_engine": "vqa_tpu.serving.engine",
    "VQAServer": "vqa_tpu.serving.server",
}

__all__ = list(_API) + ["schemas", "supervisor"]


def __getattr__(name):
    import importlib

    if name in ("schemas", "supervisor"):
        return importlib.import_module(f"vqa_tpu.serving.{name}")
    mod = _API.get(name)
    if mod is None:
        raise AttributeError(f"module 'vqa_tpu.serving' has no attribute "
                             f"{name!r}")
    return getattr(importlib.import_module(mod), name)
