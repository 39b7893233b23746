"""NumPy oracle for the velocity-gradient statistics (ops/gradients.py).

Independent float64 implementation sharing only the documented
conventions: 2nd-order central differences on the periodic wrap (or
the common interior), dx = 2*pi/n per axis when no lengths are given
else L/n, all moments about the volume means (fluctuation statistics).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

_ROT_PAIRS = {3: ((2, 1), (0, 2), (1, 0)), 2: ((1, 0),)}
_DIV_PAIRS = {3: ((0, 1), (0, 2), (1, 2)), 2: ((0, 1),)}


def gradient_stats_oracle(
    vels: Sequence[np.ndarray],
    lengths: Optional[Sequence[float]] = None,
    boundary: str = "periodic",
) -> Dict[str, np.ndarray | float]:
    nd = len(vels)
    shape = vels[0].shape
    dx = (
        [2.0 * np.pi / n for n in shape]
        if lengths is None
        else [float(L) / n for L, n in zip(lengths, shape)]
    )
    inner = tuple(slice(1, -1) for _ in range(nd))

    def grad(i, j):
        d = (np.roll(vels[i], -1, axis=j) - np.roll(vels[i], 1, axis=j)) / (2.0 * dx[j])
        return d[inner] if boundary == "interior" else d

    g = {(i, j): grad(i, j) for i in range(nd) for j in range(nd)}
    m1 = np.array([[g[(i, j)].mean() for j in range(nd)] for i in range(nd)])
    f = {k: v - m1[k] for k, v in g.items()}
    c2 = np.array([[(f[(i, j)] ** 2).mean() for j in range(nd)] for i in range(nd)])
    c3 = np.array([[(f[(i, j)] ** 3).mean() for j in range(nd)] for i in range(nd)])
    c4 = np.array([[(f[(i, j)] ** 4).mean() for j in range(nd)] for i in range(nd)])

    skew = np.where(c2 > 0, c3 / np.maximum(c2, 1e-300) ** 1.5, 0.0)
    flat = np.where(c2 > 0, c4 / np.maximum(c2, 1e-300) ** 2, 0.0)
    off = ~np.eye(nd, dtype=bool)

    enstrophy = sum(
        ((f[(a, b)] - f[(b, a)]) ** 2).mean() for a, b in _ROT_PAIRS[nd]
    )
    dil = sum(f[(i, i)] for i in range(nd))
    dilatation_msq = (dil**2).mean()

    us = [v[inner] if boundary == "interior" else v for v in vels]
    u_mean = np.array([u.mean() for u in us])
    u_var = np.array([((u - u.mean()) ** 2).mean() for u in us])
    taylor = np.sqrt(
        np.where(np.diagonal(c2) > 0, u_var / np.maximum(np.diagonal(c2), 1e-300), 0.0)
    )

    return {
        "gradient_mean": m1,
        "gradient_moment2": c2,
        "gradient_moment3": c3,
        "gradient_moment4": c4,
        "longitudinal_skewness": np.diagonal(skew).copy(),
        "derivative_skewness": float(np.diagonal(skew).mean()),
        "longitudinal_flatness": np.diagonal(flat).copy(),
        "derivative_flatness": float(np.diagonal(flat).mean()),
        "transverse_flatness": float(flat[off].mean()),
        "pseudo_dissipation": float(c2.sum()),
        "enstrophy": float(enstrophy),
        "dilatation_msq": float(dilatation_msq),
        "velocity_mean": u_mean,
        "velocity_variance": u_var,
        "taylor_microscale": taylor,
        "taylor_microscale_mean": float(taylor.mean()),
    }
