"""Lagrangian dispersion statistics over a tracer-particle series.

Beyond the reference (whose Lagrangian analyses stop at
autocorrelation and cross-correlation tracking,
reference: fava/analysis/auto_correlations.py:80-112): the two classic
Lagrangian turbulence diagnostics —

* single-particle (Taylor) dispersion ⟨|x_i(t) - x_i(0)|²⟩, whose
  short-time ballistic t² and long-time diffusive 2 D t regimes give
  the Lagrangian integral time scale, and
* pair (Richardson) dispersion ⟨|δ_ij(t)|²⟩ over nearest-neighbor
  pairs at t = 0, whose inertial-range t³ growth is the standard
  two-particle mixing diagnostic.

Design notes:

* Particles are tracked BY TAG (``rows_for_tags``, hard error on a
  missing tag): raw table order is not stable across FLASH snapshots
  (particles migrate between ranks), so positional indexing would
  silently pair different particles.
* Pairs are ``npairs`` deterministic (seeded) anchor particles, each
  paired with its nearest neighbor at t = 0 — nearest-neighbor pairing
  gives the small initial separations Richardson scaling is defined
  for, without requiring a user-chosen separation bin.
* Displacements are raw coordinate differences: FLASH tracer
  coordinates are absolute domain positions and the flame-window
  datasets this package targets are not periodic in the profile axis.
  For fully periodic runs whose particles wrap, dispersion past the
  first crossing is under-counted (documented, not hidden).

Like the reference's particle analyses, this is host-side NumPy over
the particle tables — the data is tiny next to the volumes and the
cost is file I/O, not math.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from fava_tpu.mesh.flash_particles import rows_for_tags
from fava_tpu.models.model import Model

_POS_FIELDS = ("posx", "posy", "posz")


def _nearest_neighbor_pairs(coords: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """Index of each anchor's nearest OTHER particle (chunked O(A*N)).

    |a-b|^2 = |a|^2 + |b|^2 - 2 a.b: the only chunk*N temporary is the
    matmul output itself (a (256, N, 3) broadcast difference would be
    ~6 GB at a million tracers)."""
    sq = (coords**2).sum(axis=1)
    partners = np.empty(anchors.size, dtype=np.int64)
    for s in range(0, anchors.size, 256):
        a = anchors[s : s + 256]
        d2 = sq[a, None] + sq[None, :] - 2.0 * coords[a] @ coords.T
        d2[np.arange(a.size), a] = np.inf  # exclude self
        partners[s : s + 256] = np.argmin(d2, axis=1)
    return partners


@Model.register_analysis(use_timer=True)
def dispersion_statistics(
    self,
    npairs: int = 256,
    seed: int = 0,
    file_indices: Optional[Sequence[int]] = None,
    **kwargs,
) -> Dict[str, np.ndarray]:
    """Taylor single-particle + Richardson pair dispersion vs time.

    Returns {"time", "single_msd", "pair_msd",
    "initial_pair_separation_sq", "npairs"}; ``single_msd`` averages
    over EVERY tag present at t = 0 (hard error if one later
    disappears), ``pair_msd`` over the nearest-neighbor pairs.
    """
    kwargs.setdefault("file_type", "prt")
    indices = (
        sorted(self.prt_files["by index"].keys()) if file_indices is None else list(file_indices)
    )
    if len(indices) < 2:
        raise ValueError("dispersion statistics need at least 2 particle snapshots")

    load_fields = [*_POS_FIELDS, "tag"]
    self.load(file_index=indices[0], fields=load_fields, **kwargs)
    if self.particles is None:
        raise RuntimeError("dispersion statistics require Lagrangian particles")
    ndim = min(self.particles.ndim or 3, 3)
    pos_fields = _POS_FIELDS[:ndim]

    def coords_and_tags():
        p = self.particles.data
        return np.stack([np.asarray(p[f], dtype=np.float64) for f in pos_fields], axis=1), np.asarray(
            p["tag"]
        )

    x0, tags0 = coords_and_tags()
    nparticles = x0.shape[0]
    npairs_eff = min(int(npairs), nparticles)
    rng = np.random.default_rng(seed)
    anchors = rng.choice(nparticles, size=npairs_eff, replace=False)
    partners = _nearest_neighbor_pairs(x0, anchors)

    delta0 = x0[anchors] - x0[partners]
    out: Dict[str, np.ndarray] = {
        "time": np.zeros(len(indices)),
        "single_msd": np.zeros(len(indices)),
        "pair_msd": np.zeros(len(indices)),
        "initial_pair_separation_sq": float((delta0**2).sum(axis=1).mean()),
        "npairs": npairs_eff,
    }

    for j, i in enumerate(indices):
        if j > 0:
            self.load(file_index=i, fields=load_fields, **kwargs)
        x, tags = coords_and_tags()
        rows = rows_for_tags(tags, tags0, label="tag")
        xt = x[rows]  # aligned with the t=0 tag order
        out["time"][j] = self.particles.time
        out["single_msd"][j] = (((xt - x0) ** 2).sum(axis=1)).mean()
        # rows is aligned with the tags0 order, so the anchor/partner
        # rows are plain gathers — no second/third per-snapshot sort.
        delta = xt[anchors] - xt[partners]
        out["pair_msd"][j] = ((delta**2).sum(axis=1)).mean()
    return out
