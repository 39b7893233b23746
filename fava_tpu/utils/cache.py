"""Persistent XLA compilation cache helper.

The TPU backend can take minutes to compile the big fused analysis
programs (e.g. the 512^3 flagship step), but cache hits load in well
under a second. Call :func:`enable_compilation_cache` once per process
(the pipeline CLI and bench do this automatically).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

_DEFAULT = Path.home() / ".cache" / "fava_tpu" / "xla"


def enable_compilation_cache(path: Optional[str | Path] = None) -> Path:
    """Point XLA's persistent cache at ``path``.

    Resolution order: explicit ``path`` argument, then the
    ``FAVA_TPU_CACHE_DIR`` environment variable (so driver scripts can
    hand one warm cache to ``python -m fava_tpu`` subprocesses), then
    ``~/.cache/fava_tpu/xla``.
    """
    import jax

    if path is None:
        path = os.environ.get("FAVA_TPU_CACHE_DIR") or None
    cache_dir = Path(path) if path is not None else _DEFAULT
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
