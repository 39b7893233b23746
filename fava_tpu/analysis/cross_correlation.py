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

    nfiles = len(self.prt_files["by index"])
    sample_points = np.asarray(sample_points)
    npts = sample_points.size

    ibeg = kwargs.pop("ibeg", 0)
    iend = kwargs.pop("iend", nfiles)
    imid = floor((iend - ibeg) / 2)

    lagrangian_tracking = kwargs.pop("lagrangian_tracking", None)
    if lagrangian_tracking is None:
        return None

    tagvar = kwargs.pop("tag_field", None)
    if tagvar is None:
        raise ValueError(
            "Lagrangian particle tracking selected but no name given for the particle ID tag field"
        )
    kwargs.setdefault("file_type", "prt")

    samp_data = np.zeros((nfiles, npts), dtype=float)
    temp_data = np.zeros((nfiles, 1), dtype=float)

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

    for i in (imid, *(j for j in range(nfiles) if j != imid)):
        rows = rows_for(grab(i), wanted)
        temp_data[i] = self.particles.data[tvar][rows[0]]
        samp_data[i, :] = self.particles.data[svar][rows[1:]]

    smean = samp_data[:-1, ...].mean(axis=0)
    tmean = temp_data[1:].mean()
    sstd = samp_data[:-1, ...].std(axis=0)
    tstd = temp_data[1:].std()

    Rts = np.sum(temp_data[1:] * samp_data[:-1, :], axis=0) / float(nfiles - 1)
    Kts = Rts - smean * tmean
    rho = Kts / (sstd * tstd)
    return rho
