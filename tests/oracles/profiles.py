"""NumPy oracle for the reference Reynolds-stress / slice-profile
algorithms (literal two-pass block loops, single process).

Implements the algorithm of fava/mesh/FLASH/_flash.py:1427-1611 from
its mathematical definition: per-block axis-0 row sums scaled by volume
fractions, scatter-added into finest-level bins, then per-row
density-weighted covariance accumulation against the bin-wise means.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _geometry(domain_bounds, ncells, nblks, refine_level, blocklist, raxis):
    lmax = int(refine_level.max())
    nfine = int(ncells[raxis] * nblks[raxis] * 2 ** (lmax - 1))
    rmin, rmax = domain_bounds[raxis]
    span = np.linspace(rmin, rmax, nfine + 1)

    widths = domain_bounds[:, 1] - domain_bounds[:, 0]
    min_delta = widths[raxis] / (ncells[raxis] * nblks[raxis] * 2 ** (lmax - 1))

    domain_volume = float(np.prod(widths))
    levels = refine_level[blocklist]
    cells = np.ones(len(blocklist), dtype=np.float64)
    for a in range(3):
        cells *= ncells[a] * nblks[a] * 2.0 ** (levels - 1)
    cell_volumes = domain_volume / cells
    delta_r = widths[raxis] / (ncells[raxis] * nblks[raxis] * 2.0 ** (levels - 1))
    vol_fracs = cell_volumes * (min_delta / delta_r)

    layer_area = 1.0
    for a in range(3):
        if a != raxis:
            layer_area *= widths[a]

    return lmax, nfine, span, min_delta, vol_fracs, layer_area


def slice_integral_oracle(
    field: np.ndarray,  # (nB, nx, ny, nz)
    *,
    block_bounds: np.ndarray,
    refine_level: np.ndarray,
    node_type: np.ndarray,
    domain_bounds: np.ndarray,
    ncells: np.ndarray,
    nblks: np.ndarray,
    raxis: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    blocklist = np.nonzero(node_type == 1)[0]
    lmax, nfine, span, min_delta, vol_fracs, layer_area = _geometry(
        domain_bounds, ncells, nblks, refine_level, blocklist, raxis
    )

    other_axes = tuple(a for a in range(3) if a != raxis)
    alp = np.zeros(nfine)
    for lb, blk in enumerate(blocklist):
        lref_n = 2 ** (lmax - refine_level[blk])
        lo = block_bounds[blk, raxis, 0]
        ilo = int(np.argmin(np.abs(span[:-1] - lo)))
        rows = field[blk].sum(axis=tuple(a for a in other_axes)) * vol_fracs[lb]
        for i in range(int(ncells[raxis])):
            alp[ilo + i * lref_n : ilo + (i + 1) * lref_n] += rows[i]
    return span, alp


def reynolds_stress_oracle(
    data: Dict[str, np.ndarray],
    *,
    block_bounds: np.ndarray,
    refine_level: np.ndarray,
    node_type: np.ndarray,
    domain_bounds: np.ndarray,
    ncells: np.ndarray,
    nblks: np.ndarray,
    raxis: int = 0,
    ndim: int = 3,
):
    blocklist = np.nonzero(node_type == 1)[0]
    lmax, nfine, span, min_delta, vol_fracs, layer_area = _geometry(
        domain_bounds, ncells, nblks, refine_level, blocklist, raxis
    )
    layer_volume = layer_area * min_delta
    axes = "xyz"[:ndim]
    nrb = int(ncells[raxis])
    other_axes = tuple(a for a in range(3) if a != raxis)

    keys = ["dens"] + [f"vel{a}" for a in axes]
    means = {k: np.zeros(nfine) for k in keys}
    mapping = np.zeros((len(blocklist), nrb, 2), dtype=int)

    for lb, blk in enumerate(blocklist):
        lref_n = 2 ** (lmax - refine_level[blk])
        lo = block_bounds[blk, raxis, 0]
        ilo = int(np.argmin(np.abs(span[:-1] - lo)))
        for key in keys:
            rows = data[key][blk].sum(axis=other_axes) * vol_fracs[lb]
            for i in range(nrb):
                jlo, jhi = ilo + i * lref_n, ilo + (i + 1) * lref_n
                mapping[lb, i] = [jlo, jhi]
                means[key][jlo:jhi] += rows[i]

    for k in means:
        means[k] = means[k] / layer_volume

    stress = {}
    take = [slice(None)] * 3
    for i in range(ndim):
        for j in range(i, ndim):
            key = f"R{axes[i]}{axes[j]}"
            acc = np.zeros(nfine)
            vi, vj = f"vel{axes[i]}", f"vel{axes[j]}"
            for lb, blk in enumerate(blocklist):
                for rk in range(nrb):
                    take[raxis] = rk
                    slab_d = data["dens"][blk][tuple(take)]
                    slab_i = data[vi][blk][tuple(take)]
                    slab_j = data[vj][blk][tuple(take)]
                    for ii in range(mapping[lb, rk, 0], mapping[lb, rk, 1]):
                        acc[ii] += (
                            np.sum(slab_d * (slab_i - means[vi][ii]) * (slab_j - means[vj][ii]))
                            * vol_fracs[lb]
                        )
            stress[key] = acc / layer_volume

    return span, stress, means
