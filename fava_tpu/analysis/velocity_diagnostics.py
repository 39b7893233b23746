"""Registered spectral velocity diagnostics: forward to the active mesh.

Beyond the reference (which registers only kinetic_energy_spectra,
reference: fava/analysis/kinetic_energy_spectra.py): Helmholtz
solenoidal/compressive decomposition, vorticity/dilatation derived
fields, and enstrophy/helicity shell spectra — the standard
compressible-turbulence companions of the KE spectrum, computed with
the same MXU dense-DFT transforms and binning conventions
(ops/velocity.py).
"""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def helmholtz_decomposition(self, *args, **kwargs):
    return self.mesh.helmholtz_decomposition(*args, **kwargs)


@Model.register_analysis(use_timer=True)
def vorticity(self, *args, **kwargs):
    return self.mesh.vorticity(*args, **kwargs)


@Model.register_analysis(use_timer=True)
def dilatation(self, *args, **kwargs):
    return self.mesh.dilatation(*args, **kwargs)


@Model.register_analysis(use_timer=True)
def enstrophy_spectra(self, *args, **kwargs):
    return self.mesh.enstrophy_spectra(*args, **kwargs)


@Model.register_analysis(use_timer=True)
def helicity_spectra(self, *args, **kwargs):
    return self.mesh.helicity_spectra(*args, **kwargs)


@Model.register_analysis(use_timer=True)
def transfer_spectra(self, *args, **kwargs):
    return self.mesh.transfer_spectra(*args, **kwargs)


@Model.register_analysis(use_timer=True)
def decomposed_kinetic_energy_spectra(self, *args, **kwargs):
    return self.mesh.decomposed_kinetic_energy_spectra(*args, **kwargs)


@Model.register_analysis(use_timer=True)
def anisotropic_kinetic_energy_spectra(self, *args, **kwargs):
    return self.mesh.anisotropic_kinetic_energy_spectra(*args, **kwargs)


@Model.register_analysis(use_timer=True)
def turbulence_summary(self, *args, **kwargs):
    return self.mesh.turbulence_summary(*args, **kwargs)


@Model.register_analysis(use_timer=True)
def velocity_gradient_statistics(self, *args, **kwargs):
    from fava_tpu.analysis.two_point import _uniform_mesh_method

    return _uniform_mesh_method(self.mesh, "velocity_gradient_statistics")(
        *args, **kwargs
    )


@Model.register_analysis(use_timer=True)
def gradient_invariant_pdfs(self, *args, **kwargs):
    from fava_tpu.analysis.two_point import _uniform_mesh_method

    return _uniform_mesh_method(self.mesh, "gradient_invariant_pdfs")(*args, **kwargs)
