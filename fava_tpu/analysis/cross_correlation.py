"""Space-time cross correlation (Naka et al. 2015).

Rebuild of the reference driver
(reference: fava/analysis/cross_correlation.py:10-111): correlates a set
of sample particles' spatial field at time t against a single
point-of-interest particle's temporal field at t+dt, centered on the
middle file of a particle-file series (Lagrangian tracking mode).
"""

from __future__ import annotations

from math import floor
from typing import List, Optional

import numpy as np

from fava_tpu.analysis._catalogs import particle_series_indices
from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def cross_correlation(
    self,
    spatial_field: str,
    temporal_field: str,
    sample_points: np.ndarray,
    poi_idx: int,
    *args,
    **kwargs,
) -> Optional[np.ndarray]:
    tvar = temporal_field
    svar = spatial_field
    fields: List[str] = [svar, tvar]

    file_type = kwargs.setdefault("file_type", "prt")
    indices = particle_series_indices(self, file_type)
    nfiles = len(indices)
    sample_points = np.asarray(sample_points)
    npts = sample_points.size

    # The [ibeg, iend) window is HONORED: the reference accepts both
    # kwargs but then drops the ibeg offset from the midpoint and loops
    # over every file regardless (reference cross_correlation.py:52-90),
    # correlating over the wrong time window without error.
    ibeg = int(kwargs.pop("ibeg", 0))
    iend = int(kwargs.pop("iend", nfiles))
    if not (0 <= ibeg < iend <= nfiles):
        raise ValueError(
            f"invalid series window [ibeg={ibeg}, iend={iend}) over {nfiles} particle files"
        )
    nwin = iend - ibeg
    if nwin < 2:
        raise ValueError("cross correlation needs at least 2 snapshots in the window")
    imid = ibeg + floor(nwin / 2)

    lagrangian_tracking = kwargs.pop("lagrangian_tracking", None)
    if lagrangian_tracking is None:
        return None

    tagvar = kwargs.pop("tag_field", None)
    if tagvar is None:
        raise ValueError(
            "Lagrangian particle tracking selected but no name given for the particle ID tag field"
        )

    samp_data = np.zeros((nwin, npts), dtype=float)
    temp_data = np.zeros((nwin, 1), dtype=float)

    def grab(i: int):
        # The tag column is always loaded: particles migrate between
        # ranks in FLASH output, so raw table order is not stable
        # across snapshots — every file's rows are re-resolved from its
        # OWN tag column below (the loader's sort-by-tag only applies
        # to a column literally named "tag", so it cannot be relied on
        # for arbitrary tag_field names).
        self.load(file_index=i, fields=[*fields, tagvar], *args, **kwargs)
        return np.asarray(self.particles.data.get(tagvar))

    def rows_for(tags: np.ndarray, values: np.ndarray) -> np.ndarray:
        from fava_tpu.mesh.flash_particles import rows_for_tags

        return rows_for_tags(tags, values, label=tagvar)

    wanted = np.concatenate(([poi_idx], sample_points.ravel()))

    # Midpoint first (reference semantics), then the rest of the
    # window; only files INSIDE [ibeg, iend) are loaded.
    for p in (imid, *(j for j in range(ibeg, iend) if j != imid)):
        rows = rows_for(grab(indices[p]), wanted)
        temp_data[p - ibeg] = self.particles.data[tvar][rows[0]]
        samp_data[p - ibeg, :] = self.particles.data[svar][rows[1:]]

    smean = samp_data[:-1, ...].mean(axis=0)
    tmean = temp_data[1:].mean()
    sstd = samp_data[:-1, ...].std(axis=0)
    tstd = temp_data[1:].std()

    Rts = np.sum(temp_data[1:] * samp_data[:-1, :], axis=0) / float(nwin - 1)
    Kts = Rts - smean * tmean
    rho = Kts / (sstd * tstd)
    return rho
