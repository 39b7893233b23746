"""Flame-window centroid fit.

Super-Gaussian fit of the transverse Reynolds-stress profile, locating
the flame centroid (reference: fava/mesh/FLASH/_flash.py:1613-1659).
The fit itself is a tiny 1D Levenberg-Marquardt problem, so it stays on
host via scipy — the heavy work (the stress profiles) happens on device
upstream.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import scipy.optimize

XFACT = 1.0e5  # cm -> km scaling used by the reference fit


def super_gaussian(x, amp, x0, sigma):
    return amp * np.exp(-2.0 * ((x - x0) / sigma) ** 10)


def flame_window(
    radius: np.ndarray,
    stress: Dict[str, np.ndarray],
    mask: Optional[np.ndarray] = None,
) -> float:
    """Flame centroid position from a super-Gaussian fit of Ryy + Rzz."""
    ma = mask if mask is not None else np.where(radius < np.inf)[0]
    rd = radius[ma]
    rs = {key: np.asarray(arr)[ma] for key, arr in stress.items()}

    rspan = rd / XFACT
    rmin = np.min(rspan)

    rsyyzz = rs["Ryy"] + rs["Rzz"]
    rfact = 10.0 ** np.max(np.floor(np.log10(np.maximum(rsyyzz, 1e-300))))
    rsyyzz = rsyyzz / rfact

    opt, _ = scipy.optimize.curve_fit(
        super_gaussian,
        rspan - rmin,
        rsyyzz,
        method="lm",
        p0=(np.max(rsyyzz), rspan[np.argmax(rsyyzz)], np.std(rsyyzz)),
    )
    return float(opt[1] * XFACT)
