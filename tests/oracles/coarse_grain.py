"""NumPy f64 oracle for the filtered (coarse-grained) SGS
kinetic-energy flux (ops/coarse_grain.py).

Independent full-grid np.fft implementation sharing only the
documented conventions: cutoffs in integer wavenumber units, filter
kernels sharp (|k| <= k_c) and Gaussian (exp(-pi^2 k^2 / (24 k_c^2))),
derivative operators in physical 2*pi/L units with Nyquist zeroed,
Favre construction u~ = bar(rho u)/bar(rho), SGS stress from filtered
products of the UNFILTERED fields.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def _k_grids(shape, lengths, zero_nyquist: bool):
    nd = len(shape)
    factors = (
        (1.0,) * nd
        if lengths is None
        else tuple(2.0 * np.pi / float(L) for L in lengths)
    )
    ks = []
    for axis, (n, f) in enumerate(zip(shape, factors)):
        k = np.fft.fftfreq(n, d=1.0 / n) * f
        if zero_nyquist and n % 2 == 0:
            k[n // 2] = 0.0
        kshape = [1] * nd
        kshape[axis] = n
        ks.append(k.reshape(kshape))
    return ks


def _gain(shape, kc, kernel):
    k2 = sum(k * k for k in _k_grids(shape, None, zero_nyquist=False))
    if kernel == "sharp":
        return (k2 <= kc * kc).astype(np.float64)
    return np.exp(-(np.pi**2) * k2 / (24.0 * kc * kc))


def sgs_flux_oracle(
    vels: Sequence[np.ndarray],
    dens: Optional[np.ndarray],
    kc: float,
    kernel: str = "gaussian",
    lengths=None,
    pres: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Pointwise Pi_l (and baropycnal Lambda_l when pres is given)."""
    shape = vels[0].shape
    nd = len(shape)
    g = _gain(shape, kc, kernel)
    dks = _k_grids(shape, lengths, zero_nyquist=True)

    def bar(f):
        return np.fft.ifftn(g * np.fft.fftn(f)).real

    def dbar(f, j):
        return np.fft.ifftn(1j * dks[j] * g * np.fft.fftn(f)).real

    if dens is not None:
        rb = bar(dens)
        mb = [bar(dens * v) for v in vels]
        ub = [m / rb for m in mb]
        dub = [
            [(dbar(dens * vels[i], j) - ub[i] * dbar(dens, j)) / rb for j in range(nd)]
            for i in range(nd)
        ]
        tau = [
            [bar(dens * vels[i] * vels[j]) - rb * ub[i] * ub[j] for j in range(nd)]
            for i in range(nd)
        ]
    else:
        ub = [bar(v) for v in vels]
        dub = [[dbar(vels[i], j) for j in range(nd)] for i in range(nd)]
        tau = [
            [bar(vels[i] * vels[j]) - ub[i] * ub[j] for j in range(nd)]
            for i in range(nd)
        ]

    pi = -sum(tau[i][j] * dub[i][j] for i in range(nd) for j in range(nd))
    out = {"pi": pi}
    if pres is not None:
        lam = sum(
            dbar(pres, j) * (mb[j] - rb * bar(vels[j])) / rb for j in range(nd)
        )
        out["baropycnal"] = lam
    return out


def filtered_ke_flux_oracle(
    vels: Sequence[np.ndarray],
    dens: Optional[np.ndarray],
    cutoffs: Sequence[float],
    kernel: str = "gaussian",
    lengths=None,
    pres: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    rows = [
        sgs_flux_oracle(vels, dens, kc, kernel=kernel, lengths=lengths, pres=pres)
        for kc in cutoffs
    ]
    out = {
        "kc": np.asarray(cutoffs, dtype=np.float64),
        "scale": np.pi / np.asarray(cutoffs, dtype=np.float64),
        "pi_mean": np.array([r["pi"].mean() for r in rows]),
        "pi_rms": np.array([np.sqrt((r["pi"] ** 2).mean()) for r in rows]),
    }
    if pres is not None:
        out["baropycnal_mean"] = np.array([r["baropycnal"].mean() for r in rows])
        out["baropycnal_rms"] = np.array(
            [np.sqrt((r["baropycnal"] ** 2).mean()) for r in rows]
        )
    return out
