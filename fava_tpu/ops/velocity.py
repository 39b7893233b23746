"""Spectral velocity-field diagnostics: Helmholtz decomposition,
vorticity, dilatation, and enstrophy/helicity spectra.

Beyond the reference (which stops at kinetic-energy spectra,
fava/mesh/FLASH/FlashUniform.py:229-304): these are the standard
companion diagnostics of compressible-turbulence analysis —
solenoidal/compressive mode separation, enstrophy budgets, and
helicity — and they reuse the TPU-native transform machinery this
framework already has (dense MXU DFT forward AND inverse transforms,
ops/dft.py; Hermitian-weighted Pallas shell binning,
ops/pallas_kernels.py), so each costs a few matmul passes, not a new
subsystem.

Conventions (documented where they bite):

* Periodic boxes, like every spectral analysis in the package. The
  wavenumber grid is the signed integer grid (``pfft._wavenumbers``);
  physical derivative operators scale axis i by ``2*pi/L_i`` when
  ``lengths`` is given (FLASH domains are physical cm), else the
  2*pi-periodic unit-box convention (factor = integer k) is used.
* Every spectral operator zeroes the Nyquist wavenumber of even axes:
  the array index convention assigns the un-pairable value -n/2 there,
  which breaks the symmetry real inverse transforms require — for odd
  (derivative) operators outright (standard spectral-derivative
  practice, same convention as scipy.fftpack.diff), and for the
  Helmholtz projection through its k_i*k_j cross terms, which are even
  only under flipping ALL components at once. Nyquist modes therefore
  join the k = 0 (mean-flow) mode — whose direction is equally
  undefined — in the solenoidal part.
* Spectra are shell means over the integer-|k| grid with the same
  edges, Hermitian weights, forward-norm 1/N transforms, and
  k^(d-1) * 2*pi*(d-1) integral factor as the KE spectra
  (ops/spectra.py), so slopes are directly comparable.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fava_tpu.utils import accum_dtype


def _phys_factors(lengths: Optional[Sequence[float]]) -> Tuple[float, float, float]:
    """Per-axis 2*pi/L factors turning integer wavenumbers into physical
    ones (unit factors when no domain lengths are given)."""
    if lengths is None:
        return (1.0, 1.0, 1.0)
    if len(lengths) != 3:
        raise ValueError(f"lengths must have 3 entries, got {len(lengths)}")
    return tuple(2.0 * np.pi / float(L) for L in lengths)


def _k_grids(shape: Tuple[int, int, int], dtype, lengths, zero_nyquist: bool):
    """Broadcastable (kx, ky, kz) grids on the z-rfft half-spectrum.

    ``zero_nyquist`` is required for odd (derivative) operators — see
    the module docstring.
    """
    nx, ny, nz = shape
    fx, fy, fz = _phys_factors(lengths)

    def signed(n, f):
        # Host-side twin of pfft._wavenumbers (these grids are trace-time
        # constants; no device round trip while tracing).
        j = np.arange(n)
        k = (np.where(j <= (n - 1) // 2, j, j - n) * f).astype(dtype)
        if zero_nyquist and n % 2 == 0:
            k[n // 2] = 0.0
        return k

    kx = jnp.asarray(signed(nx, fx))[:, None, None]
    ky = jnp.asarray(signed(ny, fy))[None, :, None]
    kzv = np.arange(nz // 2 + 1, dtype=dtype) * fz
    if zero_nyquist and nz % 2 == 0:
        kzv[nz // 2] = 0.0
    kz = jnp.asarray(kzv)[None, None, :]
    return kx, ky, kz


def _rfft3(v: jax.Array) -> jax.Array:
    from fava_tpu.ops.dft import rfftn_fast

    return rfftn_fast(v)


def _irfft3(spec: jax.Array, nz: int) -> jax.Array:
    # irfftn_fast carries the full 1/N normalization (numpy semantics),
    # so unnormalized-forward -> irfftn_fast round-trips exactly.
    from fava_tpu.ops.dft import irfftn_fast

    return irfftn_fast(spec, nz)


def _vorticity_hats(vhats, shape, lengths):
    """i k x v̂ on the half-spectrum grid (Nyquist-zeroed k)."""
    kx, ky, kz = _k_grids(shape, vhats[0].real.dtype, lengths, zero_nyquist=True)
    wx, wy, wz = vhats
    i = jnp.asarray(1j, dtype=vhats[0].dtype)
    return (
        i * (ky * wz - kz * wy),
        i * (kz * wx - kx * wz),
        i * (kx * wy - ky * wx),
    )


@lru_cache(maxsize=16)
def _helmholtz_fn(shape: Tuple[int, int, int], lengths):
    nx, ny, nz = shape

    def core(velx, vely, velz):
        vhats = [_rfft3(v) for v in (velx, vely, velz)]
        rdt = vhats[0].real.dtype
        kx, ky, kz = _k_grids(shape, rdt, lengths, zero_nyquist=True)
        k2 = kx * kx + ky * ky + kz * kz
        div = (kx * vhats[0] + ky * vhats[1] + kz * vhats[2]) / jnp.maximum(
            k2, jnp.asarray(1e-30, rdt)
        )
        comp = [_irfft3(k * div, nz) for k in (kx, ky, kz)]
        sol = [v - c for v, c in zip((velx, vely, velz), comp)]
        return tuple(sol), tuple(comp)

    return jax.jit(core)


def helmholtz_decompose(
    velx: jax.Array,
    vely: jax.Array,
    velz: jax.Array,
    lengths: Optional[Sequence[float]] = None,
) -> Dict[str, Dict[str, jax.Array]]:
    """Solenoidal/compressive split of a periodic 3D velocity field.

    The compressive (curl-free) part is the spectral projection onto
    k̂; the solenoidal (divergence-free) part is the remainder — the
    two sum to the input EXACTLY by construction (one inverse-transform
    set, not two). The k = 0 and Nyquist modes land in the solenoidal
    part (module docstring). ``lengths`` scales the projection
    direction for anisotropic physical domains; for a cubic box it
    cancels. Returns {"solenoidal": {velx, vely, velz},
    "compressive": {...}}.
    """
    shape = tuple(int(s) for s in velx.shape)
    if len(shape) != 3:
        raise ValueError("helmholtz_decompose requires 3D velocity volumes")
    key = None if lengths is None else tuple(float(L) for L in lengths)
    sol, comp = _helmholtz_fn(shape, key)(velx, vely, velz)
    names = ("velx", "vely", "velz")
    return {
        "solenoidal": dict(zip(names, sol)),
        "compressive": dict(zip(names, comp)),
    }


@lru_cache(maxsize=16)
def _vorticity_fn(shape: Tuple[int, int, int], lengths):
    nz = shape[2]

    def core(velx, vely, velz):
        vhats = [_rfft3(v) for v in (velx, vely, velz)]
        whats = _vorticity_hats(vhats, shape, lengths)
        return tuple(_irfft3(w, nz) for w in whats)

    return jax.jit(core)


def vorticity(
    velx: jax.Array,
    vely: jax.Array,
    velz: jax.Array,
    lengths: Optional[Sequence[float]] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Vorticity ω = ∇ x v via spectral differentiation (periodic)."""
    shape = tuple(int(s) for s in velx.shape)
    if len(shape) != 3:
        raise ValueError("vorticity requires 3D velocity volumes")
    key = None if lengths is None else tuple(float(L) for L in lengths)
    return _vorticity_fn(shape, key)(velx, vely, velz)


@lru_cache(maxsize=16)
def _dilatation_fn(shape: Tuple[int, int, int], lengths):
    nz = shape[2]

    def core(velx, vely, velz):
        vhats = [_rfft3(v) for v in (velx, vely, velz)]
        kx, ky, kz = _k_grids(shape, vhats[0].real.dtype, lengths, zero_nyquist=True)
        i = jnp.asarray(1j, dtype=vhats[0].dtype)
        theta = i * (kx * vhats[0] + ky * vhats[1] + kz * vhats[2])
        return _irfft3(theta, nz)

    return jax.jit(core)


def dilatation(
    velx: jax.Array,
    vely: jax.Array,
    velz: jax.Array,
    lengths: Optional[Sequence[float]] = None,
) -> jax.Array:
    """Dilatation θ = ∇ . v via spectral differentiation (periodic)."""
    shape = tuple(int(s) for s in velx.shape)
    if len(shape) != 3:
        raise ValueError("dilatation requires 3D velocity volumes")
    key = None if lengths is None else tuple(float(L) for L in lengths)
    return _dilatation_fn(shape, key)(velx, vely, velz)


def _bin_rfft_power(p: jax.Array, full_shape, nbins: int):
    """Shell-mean of one Hermitian power volume (kernel on TPU, scatter
    fallback elsewhere) — the scalar-spectrum binning, shared."""
    from fava_tpu.ops import pallas_kernels as pk

    adt = accum_dtype()
    counts, sums = pk.shell_bin_sums_rfft_scalar(p.astype(adt), nbins, full_shape[-1])
    return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), jnp.nan)


@lru_cache(maxsize=16)
def _spectrum_fn(shape: Tuple[int, int, int], lengths, which: str, nbins: int, path_key):
    ntot = int(np.prod(shape))
    adt = accum_dtype()

    def core(velx, vely, velz):
        vhats = [_rfft3(v) / ntot for v in (velx, vely, velz)]
        whats = _vorticity_hats(vhats, shape, lengths)
        if which == "enstrophy":
            p = (0.5 * sum(jnp.abs(w) ** 2 for w in whats)).astype(adt)
        else:  # helicity: Re(v̂* . ω̂), signed
            p = sum((jnp.conj(v) * w).real for v, w in zip(vhats, whats)).astype(adt)
        return _bin_rfft_power(p, shape, nbins)

    return jax.jit(core)


def _velocity_spectrum(vels, lengths, which: str) -> Dict[str, np.ndarray]:
    shape = tuple(int(s) for s in vels[0].shape)
    if len(shape) != 3:
        raise ValueError(f"{which}_spectrum requires 3D velocity volumes")
    nbins = max(shape) // 2 - 1
    key = None if lengths is None else tuple(float(L) for L in lengths)

    from fava_tpu.ops import pallas_kernels as pk

    mean = np.asarray(
        _spectrum_fn(shape, key, which, nbins, pk.path_key())(*vels), dtype=np.float64
    )
    k = np.arange(nbins, dtype=np.float64)
    integral_factor = k ** 2 * (2.0 * np.pi * 2.0)  # d = 3
    return {"k": k, "power": mean * integral_factor}


def enstrophy_spectrum(
    velx: jax.Array,
    vely: jax.Array,
    velz: jax.Array,
    lengths: Optional[Sequence[float]] = None,
) -> Dict[str, np.ndarray]:
    """Shell-binned enstrophy spectrum 0.5 |ω̂|² (mean over shells,
    KE-spectra binning convention and integral factor)."""
    return _velocity_spectrum((velx, vely, velz), lengths, "enstrophy")


def helicity_spectrum(
    velx: jax.Array,
    vely: jax.Array,
    velz: jax.Array,
    lengths: Optional[Sequence[float]] = None,
) -> Dict[str, np.ndarray]:
    """Shell-binned helicity spectrum Re(v̂* . ω̂) — signed, so shells
    may be negative (helicity is a signed invariant)."""
    return _velocity_spectrum((velx, vely, velz), lengths, "helicity")
