"""Wall-clock timing and profiling instrumentation.

The reference instruments every registered analysis with a root-rank
wall-clock print (reference: fava/util/__init__.py:7-16). Here the timer
additionally records per-name statistics and can emit ``jax.profiler``
trace annotations so device timelines attribute time to analyses.
"""

from __future__ import annotations

import functools
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Any, Callable, Dict, List

_TIMINGS: Dict[str, List[float]] = defaultdict(list)

# Emit "Timing: <name> --> <sec>" lines (disable for quiet runs, e.g. bench).
VERBOSE: bool = True


def timings() -> Dict[str, List[float]]:
    """All recorded wall-clock samples, keyed by function name."""
    return dict(_TIMINGS)


def reset_timings() -> None:
    _TIMINGS.clear()


@contextmanager
def trace(name: str):
    """Context manager: wall-clock a region and annotate the jax profiler trace."""
    try:
        import jax.profiler

        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover - profiler unavailable
        ctx = None

    tbeg = time.perf_counter()
    if ctx is not None:
        with ctx:
            yield
    else:
        yield
    _TIMINGS[name].append(time.perf_counter() - tbeg)


def timer(func: Callable[..., Any]) -> Callable[..., Any]:
    """Decorator printing and recording the wall-clock time of each call."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        tbeg = time.perf_counter()
        result = func(*args, **kwargs)
        tend = time.perf_counter()
        _TIMINGS[func.__name__].append(tend - tbeg)
        if VERBOSE:
            print(f"Timing: {func.__name__} --> {tend - tbeg:2.4f}", flush=True)
        return result

    return wrapper
