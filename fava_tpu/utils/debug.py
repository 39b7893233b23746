"""Debug / correctness-check toggles.

Single-controller JAX has no shared-memory races to detect (the
reference's barrier-ordered MPI windows, SURVEY §5, have no analog
here); the failure modes that remain are numerical. ``enable_checks``
turns on NaN/Inf trapping inside jitted programs and optionally
disables jit so kernels run op-by-op for debugging.
"""

from __future__ import annotations

import jax


def enable_checks(nan_checks: bool = True, disable_jit: bool = False) -> None:
    if nan_checks:
        jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)


def disable_checks() -> None:
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_disable_jit", False)
