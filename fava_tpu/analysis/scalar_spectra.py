"""Registered scalar_spectra analysis: forwards to the active mesh.

Beyond the reference (which registers only kinetic_energy_spectra):
power spectra of scalar fields — density, flame progress, temperature —
with the same binning convention and integral factor as the KE spectra.
"""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def scalar_spectra(self, *args, **kwargs):
    return self.mesh.scalar_spectra(*args, **kwargs)
