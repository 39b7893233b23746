"""Persistent XLA compilation cache helper.

The TPU backend can take minutes to compile the big fused analysis
programs (e.g. the 512^3 flagship step), but cache hits load in well
under a second. Call :func:`enable_compilation_cache` once per process
(the pipeline CLI and bench do this automatically).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

_DEFAULT = Path.home() / ".cache" / "fava_tpu" / "xla"


def enable_compilation_cache(path: Optional[str | Path] = None) -> Path:
    import jax

    cache_dir = Path(path) if path is not None else _DEFAULT
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
