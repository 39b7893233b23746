"""Error-free float transformations (two-float / double-word arithmetic).

TPU has no hardware float64 and the device compute dtype is float32
(utils/precision.py). Where an analysis needs BINNING DECISIONS that
agree with the float64 oracles — e.g. pair-separation histogram edges,
where one f32 rounding (2**-24 relative) flips a pair across a bin
edge — these classic error-free transformations (Dekker 1971, Knuth
TAOCP 2, Shewchuk 1997) carry intermediates as an UNEVALUATED PAIR
``(hi, lo)`` with ``hi + lo`` exact (or within ~1 ulp of ``lo`` for
the compound ops), narrowing the ambiguous window around an edge from
2**-24 to ~2**-48 relative — below the hit probability of any finite
sample.

All functions are branch-free elementwise jnp ops (VPU-friendly,
jit/vmap-safe) and dtype-generic: the float64 CPU test path gets
double-double precision through the same code.

Numerics contract (doctests):

>>> import numpy as np
>>> h, l = two_sum(np.float32(1.0), np.float32(2.0**-30))
>>> float(h), float(l)
(1.0, 9.313225746154785e-10)
>>> h, l = two_prod(np.float32(1 + 2.0**-23), np.float32(1 + 2.0**-23))
>>> float(h) == 1 + 2.0**-22 and float(l) == 2.0**-46
True
>>> x = two_diff(np.float32(1.0), np.float32(2.0**-25))
>>> s, e = square(x)
>>> bool(s == np.float32(1 - 2.0**-24))  # (1 - 2**-25)**2 rounded
True
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "two_sum",
    "two_diff",
    "two_prod",
    "quick_two_sum",
    "add",
    "sub",
    "square",
    "ge",
    "gt",
    "le",
    "lt",
    "split_f64",
]


def _split_factor(dtype):
    # 2**ceil(p/2) + 1 with p the mantissa width (Dekker's splitter).
    return 134217729.0 if jnp.dtype(dtype) == jnp.float64 else 4097.0


def two_sum(a, b):
    """Knuth 2Sum: (s, e) with s = fl(a + b) and s + e == a + b exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def two_diff(a, b):
    """(s, e) with s + e == a - b exactly."""
    s = a - b
    bb = s - a
    e = (a - (s - bb)) - (b + bb)
    return s, e


def quick_two_sum(a, b):
    """2Sum fast path, REQUIRES |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    # jnp.result_type works for tracers AND plain NumPy values, so the
    # doctests run pure-NumPy while jitted callers stay traceable.
    c = a * _split_factor(jnp.result_type(a))
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Dekker product: (p, e) with p + e == a * b exactly (no FMA needed)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(x, y):
    """Double-word add of pairs x=(xh,xl), y=(yh,yl); error O(ulp(lo))."""
    sh, sl = two_sum(x[0], y[0])
    th, tl = two_sum(x[1], y[1])
    sh, sl = quick_two_sum(sh, sl + th)
    return quick_two_sum(sh, sl + tl)


def sub(x, y):
    return add(x, (-y[0], -y[1]))


def square(x):
    """Double-word square of pair x; error O(ulp(lo))."""
    p, e = two_prod(x[0], x[0])
    e = e + (2.0 * x[0]) * x[1] + x[1] * x[1]
    return quick_two_sum(p, e)


def ge(x, y):
    return (x[0] > y[0]) | ((x[0] == y[0]) & (x[1] >= y[1]))


def gt(x, y):
    return (x[0] > y[0]) | ((x[0] == y[0]) & (x[1] > y[1]))


def le(x, y):
    return ge(y, x)


def lt(x, y):
    return gt(y, x)


def split_f64(values: np.ndarray, dtype) -> tuple[np.ndarray, np.ndarray]:
    """Host-side: float64 constants -> (hi, lo) pair in ``dtype`` with
    hi + lo reproducing the float64 value (lo == 0 when dtype is f64)."""
    v = np.asarray(values, dtype=np.float64)
    hi = v.astype(dtype)
    lo = (v - hi.astype(np.float64)).astype(dtype)
    return hi, lo
