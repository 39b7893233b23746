"""Volume-wise reductions, mass sums, and PDFs.

These fill in the API surface the reference *declares but never
implements* — ``volume_average``, ``volume_integration``, ``pdf1d``,
``pdf2d``, ``mass_sum`` are registered analysis wrappers with no mesh
backing (SURVEY §2 "declared-but-absent"); ``mass_fraction`` exists
only on FlashUniform (reference: fava/mesh/FLASH/FlashUniform.py:449-458).
All are AMR-aware: cells are weighted by their refinement-level volume.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fava_tpu.utils import accum_dtype


@jax.jit
def _block_sums(data: jax.Array) -> jax.Array:
    return jnp.sum(data.astype(accum_dtype()), axis=tuple(range(1, data.ndim)))


def volume_integration(
    data: jax.Array, cell_volumes: np.ndarray, blocklist: Optional[np.ndarray] = None
) -> float:
    """integral(field dV) = sum over leaf blocks of blocksum * cell_volume."""
    if blocklist is not None:
        data = jnp.take(data, jnp.asarray(blocklist), axis=0)
    if data.ndim == 3:  # single uniform block
        data = data[None]
    sums = _block_sums(data)
    return float(jnp.sum(sums * jnp.asarray(cell_volumes, dtype=sums.dtype)))


def volume_average(
    data: jax.Array,
    cell_volumes: np.ndarray,
    domain_volume: float,
    blocklist: Optional[np.ndarray] = None,
) -> float:
    return volume_integration(data, cell_volumes, blocklist) / float(domain_volume)


def mass_sum(
    dens: jax.Array,
    cell_volume: float,
    masks: Optional[Dict[str, jax.Array]] = None,
) -> Dict[str, float]:
    """Total mass plus per-mask masses (reference mass_fraction semantics)."""
    mass = dens.astype(accum_dtype()) * cell_volume
    out = {"total": float(jnp.sum(mass))}
    for name, mask in (masks or {}).items():
        out[name] = float(jnp.sum(jnp.where(jnp.asarray(mask), mass, 0)))
    return out


@jax.jit
def _minmax_fn(values):
    return jnp.stack([jnp.min(values), jnp.max(values)])


_HIST_CHUNK = 16


def _interval_hist(v, w, edges, nbins: int):
    """Weighted histogram by chunked INTERVAL sums (in-trace helper).

    counts[b] = sum of w where edges[b] <= v < edges[b+1] (last bin
    closed at edges[-1]), scanned over edge-pair chunks — np.histogram
    semantics against the exact edge values passed in. Two deliberate
    properties vs the alternatives:

    * no scatter: a 512^3 scatter-add measured 1.2 s on TPU;
    * no differenced cumulatives: diff of ~1e8-scale f32 cumulative
      sums quantizes sparse tail bins to ulp(total) (can go negative);
      direct per-bin sums stay integer-exact below 2^24 per BIN.
    """
    nch = -(-nbins // _HIST_CHUNK)
    pad = nch * _HIST_CHUNK - nbins
    lower = jnp.concatenate([edges[:-1], jnp.full((pad,), jnp.inf, dtype=edges.dtype)])
    upper = jnp.concatenate([edges[1:], jnp.full((pad,), jnp.inf, dtype=edges.dtype)])

    def step(_, lu):
        lo_e, hi_e = lu
        m = (v[None, :] >= lo_e[:, None]) & (v[None, :] < hi_e[:, None])
        return None, jnp.sum(jnp.where(m, w[None, :], 0), axis=1)

    _, counts = jax.lax.scan(
        step, None, (lower.reshape(nch, _HIST_CHUNK), upper.reshape(nch, _HIST_CHUNK))
    )
    counts = counts.ravel()[:nbins]
    return counts.at[-1].add(jnp.sum(jnp.where(v == edges[-1], w, 0)))


@lru_cache(maxsize=16)
def _hist1d_fn(nbins: int):
    @jax.jit
    def hist(values, weights, edges):
        adt = accum_dtype()
        return _interval_hist(
            values.ravel().astype(adt), weights.ravel().astype(adt), edges, nbins
        )

    return hist


@lru_cache(maxsize=16)
def _hist2d_fn(nbx: int, nby: int):
    @jax.jit
    def hist(xv, yv, weights, xlo, xhi, ylo, yhi):
        adt = accum_dtype()
        x = xv.ravel()
        y = yv.ravel()
        w = weights.ravel().astype(adt)
        ix = jnp.clip(jnp.floor((x - xlo) / (xhi - xlo) * nbx).astype(jnp.int32), 0, nbx - 1)
        iy = jnp.clip(jnp.floor((y - ylo) / (yhi - ylo) * nby).astype(jnp.int32), 0, nby - 1)
        valid = (x >= xlo) & (x <= xhi) & (y >= ylo) & (y <= yhi)
        flat = ix * nby + iy
        h = jnp.zeros(nbx * nby, dtype=adt).at[flat].add(jnp.where(valid, w, 0))
        return h.reshape(nbx, nby)

    return hist


def _cell_weights(shape, cell_volumes: Optional[np.ndarray], dens: Optional[jax.Array]) -> jax.Array:
    """Per-cell weights: volume (AMR-aware) and optionally mass (x dens)."""
    if cell_volumes is None:
        w = jnp.ones(shape, dtype=accum_dtype())
    else:
        cv = jnp.asarray(cell_volumes, dtype=accum_dtype())
        w = jnp.broadcast_to(cv.reshape((-1,) + (1,) * (len(shape) - 1)), shape)
    if dens is not None:
        w = w * dens.astype(accum_dtype())
    return w


def pdf1d(
    values: jax.Array,
    *,
    nbins: int = 100,
    vrange: Optional[Tuple[float, float]] = None,
    weights: Optional[jax.Array] = None,
    density: bool = True,
) -> Dict[str, np.ndarray]:
    """Weighted 1D PDF of a field (declared-but-absent in the reference)."""
    if vrange is None:
        mm = np.asarray(_minmax_fn(values), dtype=np.float64)  # one fetch
        vrange = (float(mm[0]), float(mm[1]))
    lo, hi = float(vrange[0]), float(vrange[1])
    if hi <= lo:
        hi = lo + 1.0
    w = weights if weights is not None else jnp.ones_like(values)
    edges = np.linspace(lo, hi, nbins + 1)
    counts = np.asarray(
        _hist1d_fn(int(nbins))(values, w, jnp.asarray(edges, dtype=accum_dtype())),
        dtype=np.float64,
    )
    out = counts
    if density:
        total = counts.sum()
        widths = np.diff(edges)
        out = counts / (total * widths) if total > 0 else counts
    return {"edges": edges, "centers": 0.5 * (edges[1:] + edges[:-1]), "pdf": out, "counts": counts}


def pdf2d(
    xvalues: jax.Array,
    yvalues: jax.Array,
    *,
    nbins: Tuple[int, int] = (100, 100),
    xrange: Optional[Tuple[float, float]] = None,
    yrange: Optional[Tuple[float, float]] = None,
    weights: Optional[jax.Array] = None,
    density: bool = True,
) -> Dict[str, np.ndarray]:
    """Weighted joint PDF of two fields (declared-but-absent in the reference)."""
    if xrange is None:
        xrange = (float(jnp.min(xvalues)), float(jnp.max(xvalues)))
    if yrange is None:
        yrange = (float(jnp.min(yvalues)), float(jnp.max(yvalues)))
    if isinstance(nbins, int):
        nbins = (nbins, nbins)
    xlo, xhi = map(float, xrange)
    ylo, yhi = map(float, yrange)
    if xhi <= xlo:
        xhi = xlo + 1.0
    if yhi <= ylo:
        yhi = ylo + 1.0
    w = weights if weights is not None else jnp.ones_like(xvalues)
    counts = np.asarray(
        _hist2d_fn(int(nbins[0]), int(nbins[1]))(xvalues, yvalues, w, xlo, xhi, ylo, yhi),
        dtype=np.float64,
    )
    xedges = np.linspace(xlo, xhi, nbins[0] + 1)
    yedges = np.linspace(ylo, yhi, nbins[1] + 1)
    out = counts
    if density:
        total = counts.sum()
        area = np.outer(np.diff(xedges), np.diff(yedges))
        out = counts / (total * area) if total > 0 else counts
    return {"xedges": xedges, "yedges": yedges, "pdf": out, "counts": counts}


@lru_cache(maxsize=16)
def _density_pdf_fn(nbins: int, fixed_range: bool):
    @jax.jit
    def core(rho, w, lo_in, hi_in):
        adt = accum_dtype()
        r = rho.ravel().astype(adt)
        wv = w.ravel().astype(adt)
        wsum = jnp.sum(wv)
        rho_mean = jnp.sum(wv * r) / wsum
        s = jnp.log(r / rho_mean)
        mu = jnp.sum(wv * s) / wsum
        d = s - mu
        m2 = jnp.sum(wv * d * d) / wsum
        m3 = jnp.sum(wv * d * d * d) / wsum
        m4 = jnp.sum(wv * d * d * d * d) / wsum
        sigma = jnp.sqrt(m2)
        if fixed_range:
            lo, hi = lo_in, hi_in
        else:
            # nsigma window around the measured moments (lo_in = nsigma)
            lo = mu - lo_in * sigma
            hi = mu + lo_in * sigma
        hi = jnp.where(hi > lo, hi, lo + 1.0)  # constant field: sigma = 0
        # in-trace edges (the range is data-dependent here); the
        # scatter-free interval histogram is shared with pdf1d
        edges = lo + (hi - lo) * (jnp.arange(nbins + 1, dtype=adt) / nbins)
        counts = _interval_hist(s, wv, edges, nbins)
        # one packed vector -> one tunnel fetch (~27 ms floor per fetch)
        return jnp.concatenate(
            [jnp.stack([rho_mean, mu, sigma, m3, m4, lo, hi]).astype(adt), counts]
        )

    return core


def density_pdf(
    dens: jax.Array,
    *,
    weights: Optional[jax.Array] = None,
    nbins: int = 200,
    srange: Optional[Tuple[float, float]] = None,
    nsigma: float = 5.0,
    mach: Optional[float] = None,
) -> Dict[str, np.ndarray]:
    """Lognormality diagnostics of the density field (beyond the
    reference, which has no density-PDF analysis at all — its ``pdf1d``
    wrapper is declared-but-absent, fava/analysis/__init__.py).

    Works on the log-density contrast ``s = ln(rho / <rho>)`` with
    ``<rho>`` the (optionally weighted) mean — the variable in which
    isothermal supersonic turbulence is lognormal (Vazquez-Semadeni
    1994; Federrath et al. 2008). One jit dispatch computes the
    weighted PDF of ``s`` over ``srange`` (default: ``mean_s`` ±
    ``nsigma * sigma_s``, measured in the same pass) AND the exact
    weighted moments on device — the returned ``mean_s`` / ``sigma_s``
    / ``skewness`` / ``excess_kurtosis`` come from full-volume sums,
    not from the binned histogram. Extras:

    * ``lognormal_residual`` — ``|mean_s + sigma_s^2 / 2|``: exactly 0
      for a lognormal (mass conservation pins the mean of a lognormal
      ``s``-PDF at ``-sigma^2/2``); deviation measures non-lognormality
      (intermittency, shocks, self-gravity).
    * ``b_parameter`` (when the rms Mach number ``mach`` is given) —
      the turbulence driving parameter from the standard variance
      relation ``sigma_s^2 = ln(1 + b^2 M^2)``: ~1/3 solenoidal,
      ~1 compressive driving.

    ``weights``: per-cell volume (AMR) or mass weights; None = uniform
    (volume-weighted s-PDF on a uniform grid).
    """
    if nbins < 1:
        raise ValueError(f"nbins must be >= 1, got {nbins}")
    w = weights if weights is not None else jnp.ones_like(dens)
    if tuple(w.shape) != tuple(dens.shape):
        raise ValueError(
            f"weights shape {tuple(w.shape)} does not match dens shape {tuple(dens.shape)}"
        )
    fixed = srange is not None
    lo_in, hi_in = (map(float, srange)) if fixed else (float(nsigma), 0.0)
    packed = np.asarray(
        _density_pdf_fn(int(nbins), fixed)(dens, w, lo_in, hi_in), dtype=np.float64
    )
    rho_mean, mu, sigma, m3, m4, lo, hi = packed[:7].tolist()
    counts = packed[7:]
    edges = np.linspace(lo, hi, nbins + 1)
    widths = np.diff(edges)
    total = counts.sum()
    pdf = counts / (total * widths) if total > 0 else counts
    out = {
        "edges": edges,
        "centers": 0.5 * (edges[1:] + edges[:-1]),
        "pdf": pdf,
        "counts": counts,
        "rho_mean": rho_mean,
        "mean_s": mu,
        "sigma_s": sigma,
        "skewness": m3 / sigma**3 if sigma > 0 else 0.0,
        "excess_kurtosis": m4 / sigma**4 - 3.0 if sigma > 0 else 0.0,
        "lognormal_residual": abs(mu + 0.5 * sigma**2),
    }
    if mach is not None:
        m = float(mach)
        if m <= 0:
            raise ValueError(f"mach must be positive, got {m}")
        out["b_parameter"] = float(np.sqrt(np.expm1(sigma**2)) / m)
    return out
