"""Registered kinetic_energy_spectra analysis: forwards to the active mesh
(reference pattern: fava/analysis/kinetic_energy_spectra.py)."""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def kinetic_energy_spectra(self, *args, **kwargs):
    return self.mesh.kinetic_energy_spectra(*args, **kwargs)
