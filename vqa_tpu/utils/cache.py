"""Persistent XLA compilation cache helper.

First compiles of the full model take tens of seconds (minutes on a 1-core
host); the persistent cache makes every subsequent process start warm.
Called from tests/conftest.py, bench.py, the trainer, and the server.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """VQA_COMPILE_CACHE overrides the default directory (but not an
    explicit ``cache_dir``) — used to validate cold-cache behavior by
    pointing a run at an empty directory without touching the warm one."""
    import jax

    cache_dir = cache_dir or os.environ.get("VQA_COMPILE_CACHE") or _DEFAULT_DIR
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
