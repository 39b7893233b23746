"""NumPy oracle for the spectral velocity diagnostics (ops/velocity.py).

Independent full-grid np.fft implementation of the Helmholtz
decomposition, spectral curl/divergence, and enstrophy/helicity shell
spectra, sharing only the documented conventions: signed integer
wavenumbers times 2*pi/L physical factors, Nyquist wavenumbers zeroed
in odd (derivative) operators, k = 0 assigned to the solenoidal part,
shell means on the integer-|k| grid with binned_statistic edges
arange(max(n)//2) - 0.5 and the k^2 * 4*pi integral factor (d = 3).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
from scipy.stats import binned_statistic


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


def helmholtz_oracle(vels: Sequence[np.ndarray], lengths=None):
    """(solenoidal, compressive) component triples, full-grid np.fft.

    Nyquist wavenumbers are zeroed like the derivative operators: the
    k_i*k_j cross terms of the projection are even only under flipping
    all components, so the aliased -n/2 planes are not Hermitian-safe.
    """
    shape = vels[0].shape
    vhats = [np.fft.fftn(v) for v in vels]
    ks = _k_grids(shape, lengths, zero_nyquist=True)
    k2 = sum(k * k for k in ks)
    div = sum(k * w for k, w in zip(ks, vhats)) / np.maximum(k2, 1e-300)
    comp = [np.fft.ifftn(k * div).real for k in ks]
    sol = [v - c for v, c in zip(vels, comp)]
    return sol, comp


def vorticity_oracle(vels: Sequence[np.ndarray], lengths=None):
    shape = vels[0].shape
    vhats = [np.fft.fftn(v) for v in vels]
    kx, ky, kz = _k_grids(shape, lengths, zero_nyquist=True)
    wx, wy, wz = vhats
    curls = (
        1j * (ky * wz - kz * wy),
        1j * (kz * wx - kx * wz),
        1j * (kx * wy - ky * wx),
    )
    return [np.fft.ifftn(c).real for c in curls]


def dilatation_oracle(vels: Sequence[np.ndarray], lengths=None):
    shape = vels[0].shape
    vhats = [np.fft.fftn(v) for v in vels]
    ks = _k_grids(shape, lengths, zero_nyquist=True)
    return np.fft.ifftn(1j * sum(k * w for k, w in zip(ks, vhats))).real


def vorticity_2d_oracle(vels: Sequence[np.ndarray], lengths=None):
    """Scalar out-of-plane vorticity of a 2D flow."""
    shape = vels[0].shape
    vhats = [np.fft.fftn(v) for v in vels]
    kx, ky = _k_grids(shape, lengths, zero_nyquist=True)
    return np.fft.ifftn(1j * (kx * vhats[1] - ky * vhats[0])).real


def enstrophy_spectrum_2d_oracle(vels: Sequence[np.ndarray], lengths=None):
    """Full-grid shell means of 0.5 |ω̂_z|² for a 2D flow."""
    shape = vels[0].shape
    ntot = np.prod(shape)
    vhats = [np.fft.fftn(v) / ntot for v in vels]
    kx, ky = _k_grids(shape, lengths, zero_nyquist=True)
    wz = 1j * (kx * vhats[1] - ky * vhats[0])
    return _shell_mean(0.5 * np.abs(wz) ** 2, shape)


def _shell_mean(p: np.ndarray, shape) -> Dict[str, np.ndarray]:
    nd = len(shape)
    ks = _k_grids(shape, None, zero_nyquist=False)
    k_abs = np.sqrt(sum(k * k for k in ks))
    bins = np.arange(max(shape) // 2) - 0.5
    mean, _, _ = binned_statistic(k_abs.ravel(), p.ravel(), statistic="mean", bins=bins)
    k = np.arange(len(bins) - 1, dtype=np.float64)
    return {"k": k, "power": mean * k ** (nd - 1) * (2.0 * np.pi * (nd - 1))}


def enstrophy_spectrum_oracle(vels: Sequence[np.ndarray], lengths=None):
    """Full-grid shell means of 0.5 |ω̂|² (forward-normalized FFT)."""
    shape = vels[0].shape
    ntot = np.prod(shape)
    vhats = [np.fft.fftn(v) / ntot for v in vels]
    kx, ky, kz = _k_grids(shape, lengths, zero_nyquist=True)
    wx, wy, wz = vhats
    curls = (
        1j * (ky * wz - kz * wy),
        1j * (kz * wx - kx * wz),
        1j * (kx * wy - ky * wx),
    )
    p = 0.5 * sum(np.abs(c) ** 2 for c in curls)
    return _shell_mean(p, shape)


def transfer_spectrum_oracle(vels: Sequence[np.ndarray], lengths=None, dealias=False):
    """Full-grid shell SUMS of the conservative-form nonlinear energy
    transfer T(k) = -Re(v̂*_i i k_j F[u_i u_j]) and flux -cumsum(T);
    optional 2/3-rule truncation (|k_i| < n_i/3 per axis)."""
    shape = vels[0].shape
    nd = len(shape)
    ntot = np.prod(shape)
    raw = [np.fft.fftn(v) for v in vels]
    if dealias:
        keep = np.ones(shape, dtype=bool)
        for axis, n in enumerate(shape):
            j = np.arange(n)
            k = np.abs(np.where(j <= (n - 1) // 2, j, j - n))
            kshape = [1] * nd
            kshape[axis] = n
            keep &= (k < n / 3.0).reshape(kshape)
        raw = [w * keep for w in raw]
        vels = [np.fft.ifftn(w).real for w in raw]
    vhats = [w / ntot for w in raw]
    ks = _k_grids(shape, lengths, zero_nyquist=True)
    t_density = np.zeros(shape)
    for i in range(nd):
        adv = sum(
            ks[j] * np.fft.fftn(vels[i] * vels[j]) / ntot for j in range(nd)
        )
        t_density += -(np.conj(vhats[i]) * (1j * adv)).real
    ks_int = _k_grids(shape, None, zero_nyquist=False)
    k_abs = np.sqrt(sum(k * k for k in ks_int))
    if dealias:
        # Shell range extended over the kept corner modes (same rule as
        # ops/velocity.dealiased_nbins) so conservation holds binned.
        kmax = np.sqrt(sum(((n - 1) // 3) ** 2 for n in shape))
        nbins = int(np.floor(kmax + 0.5)) + 1
    else:
        nbins = max(shape) // 2 - 1
    bins = np.arange(nbins + 1) - 0.5
    sums, _, _ = binned_statistic(k_abs.ravel(), t_density.ravel(), statistic="sum", bins=bins)
    return {
        "k": np.arange(nbins, dtype=np.float64),
        "transfer": sums,
        "flux": -np.cumsum(sums),
    }


def helicity_spectrum_oracle(vels: Sequence[np.ndarray], lengths=None):
    """Full-grid shell means of Re(v̂* . ω̂) (signed)."""
    shape = vels[0].shape
    ntot = np.prod(shape)
    vhats = [np.fft.fftn(v) / ntot for v in vels]
    kx, ky, kz = _k_grids(shape, lengths, zero_nyquist=True)
    wx, wy, wz = vhats
    curls = (
        1j * (ky * wz - kz * wy),
        1j * (kz * wx - kx * wz),
        1j * (kx * wy - ky * wx),
    )
    p = sum((np.conj(v) * c).real for v, c in zip(vhats, curls))
    return _shell_mean(p, shape)


def decomposed_ke_spectra_oracle(
    vels: Sequence[np.ndarray], dens: Optional[np.ndarray] = None, lengths=None
):
    """Full-grid shell means of the solenoidal/compressive KE split
    (optionally of the Kida-Orszag variable sqrt(rho) u)."""
    shape = vels[0].shape
    ntot = np.prod(shape)
    if dens is not None:
        vels = [np.sqrt(dens) * v for v in vels]
    vhats = [np.fft.fftn(v) / ntot for v in vels]
    ks = _k_grids(shape, lengths, zero_nyquist=True)
    k2 = sum(k * k for k in ks)
    div = sum(k * w for k, w in zip(ks, vhats)) / np.maximum(k2, 1e-300)
    comps = [k * div for k in ks]
    sols = [w - c for w, c in zip(vhats, comps)]
    out = {}
    for name, parts in (("total", vhats), ("solenoidal", sols), ("compressive", comps)):
        p = 0.5 * sum(np.abs(w) ** 2 for w in parts)
        r = _shell_mean(p, shape)
        out["k"] = r["k"]
        out[name] = r["power"]
    return out


def anisotropic_ke_spectra_oracle(vels: Sequence[np.ndarray], axis: int = 0):
    """Full-grid parallel/perpendicular KE sums relative to ``axis``,
    split by velocity component (axial vs transverse), binned by
    integer |k_axis| and integer-rounded perpendicular radius."""
    shape = vels[0].shape
    nd = len(shape)
    ntot = np.prod(shape)
    kints = []
    for a, n in enumerate(shape):
        j = np.arange(n)
        k = np.abs(np.where(j <= (n - 1) // 2, j, j - n)).astype(np.float64)
        ksh = [1] * nd
        ksh[a] = n
        kints.append(k.reshape(ksh))
    perp_axes = [a for a in range(nd) if a != axis]
    kpar = np.broadcast_to(kints[axis], shape).astype(np.int64)
    rperp = np.sqrt(sum(kints[a] ** 2 for a in perp_axes))
    bperp = np.floor(np.broadcast_to(rperp, shape) + 0.5).astype(np.int64)
    npar = shape[axis] // 2 + 1
    nperp = int(bperp.max()) + 1
    out = {
        "k_par": np.arange(npar, dtype=np.float64),
        "k_perp": np.arange(nperp, dtype=np.float64),
    }
    for name, comps in (
        ("axial", [vels[axis]]),
        ("transverse", [v for a, v in enumerate(vels) if a != axis]),
    ):
        p = sum(0.5 * np.abs(np.fft.fftn(v) / ntot) ** 2 for v in comps)
        out[f"par_{name}"] = np.bincount(kpar.ravel(), p.ravel(), minlength=npar)
        out[f"perp_{name}"] = np.bincount(bperp.ravel(), p.ravel(), minlength=nperp)
    out["par_total"] = out["par_axial"] + out["par_transverse"]
    out["perp_total"] = out["perp_axial"] + out["perp_transverse"]
    return out


def turbulence_summary_oracle(
    vels: Sequence[np.ndarray],
    dens: Optional[np.ndarray] = None,
    pres: Optional[np.ndarray] = None,
    gamma=5.0 / 3.0,
    lengths=None,
):
    """Full-grid np.fft twin of ops/velocity.turbulence_summary."""
    shape = vels[0].shape
    nd = len(shape)
    ntot = np.prod(shape)
    out = {}
    u2 = sum(v**2 for v in vels)
    out["u_rms"] = np.sqrt(np.mean(u2))
    out["kinetic_energy"] = 0.5 * np.mean(u2)
    if dens is not None:
        out["kinetic_energy_density"] = 0.5 * np.mean(dens * u2)
        s = np.log(dens / dens.mean())
        out["mean_s"] = s.mean()
        out["sigma_s"] = s.std()
    if pres is not None:
        cs2 = np.asarray(gamma) * pres / dens
        m2 = u2 / cs2
        out["mach_rms"] = np.sqrt(np.mean(m2))
        out["mach_max"] = np.sqrt(np.max(m2))
        out["sound_speed_mean"] = np.mean(np.sqrt(cs2))

    vhats = [np.fft.fftn(v) / ntot for v in vels]
    ks = _k_grids(shape, lengths, zero_nyquist=True)
    k2 = sum(k * k for k in ks)
    kmag = np.sqrt(np.broadcast_to(k2, shape))
    e_mode = sum(0.5 * np.abs(w) ** 2 for w in vhats)
    e_sum = e_mode.sum()
    e_fluct = e_sum - e_mode.flat[0]
    m_inv = np.sum(np.where(kmag > 0, e_mode / np.maximum(kmag, 1e-300), 0.0))
    m_2 = np.sum(e_mode * k2)
    out["integral_scale"] = (3 * np.pi / 4 if nd == 3 else np.pi / 2) * m_inv / e_fluct
    out["taylor_scale"] = np.sqrt((5.0 if nd == 3 else 2.0) * e_fluct / m_2)

    div = sum(k * w for k, w in zip(ks, vhats))
    div_amp2 = np.abs(div) ** 2 / np.maximum(k2, 1e-300)
    comp_e = np.sum(0.5 * div_amp2)
    out["compressive_fraction"] = comp_e / e_sum
    out["solenoidal_fraction"] = 1.0 - out["compressive_fraction"]
    out["dilatation_rms"] = np.sqrt(np.sum(div_amp2 * k2))
    if nd == 3:
        kx, ky, kz = ks
        wx, wy, wz = vhats
        curls = (ky * wz - kz * wy, kz * wx - kx * wz, kx * wy - ky * wx)
        out["vorticity_rms"] = np.sqrt(sum(np.sum(np.abs(c) ** 2) for c in curls))
    else:
        kx, ky = ks
        out["vorticity_rms"] = np.sqrt(np.sum(np.abs(kx * vhats[1] - ky * vhats[0]) ** 2))
    return out
