"""In-memory model handle: run the registered analyses on plain arrays.

Beyond the reference (which can only read its own FLASH HDF5 files):
``fava_tpu.from_arrays({"dens": rho, "velx": vx, ...})`` returns a
Model carrying an in-memory FlashUniform mesh, so every registered
uniform-grid analysis (kinetic_energy_spectra, turbulence_summary,
two_point_correlation, density_pdf, projection, ...) works on data
from any simulation code or synthesis with zero file round trips.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from fava_tpu.models.model import Model


class InMemoryModel(Model):
    """Model wrapper around an in-memory mesh (no directory catalog).

    File-oriented Model features (catalogs, ``load``, writers) are
    unavailable; the registered analysis methods all work.
    """

    def __init__(self, mesh, name: str = "in-memory"):
        # deliberately skip Model.__init__ (it validates a directory)
        self._directory = Path(".")
        self.files = []
        self._name = name
        self.mesh = mesh

    def load(self, *args, **kwargs):
        raise NotImplementedError(
            "InMemoryModel has no file catalog; construct it via fava_tpu.from_arrays"
        )


def from_arrays(
    fields: Dict[str, np.ndarray],
    domain_bounds: Optional[np.ndarray] = None,
    time: float = 0.0,
    name: str = "in-memory",
) -> InMemoryModel:
    """Model handle over plain arrays (see module docstring)."""
    from fava_tpu.mesh.flash_uniform import FlashUniform

    return InMemoryModel(
        FlashUniform.from_arrays(fields, domain_bounds=domain_bounds, time=time),
        name=name,
    )
