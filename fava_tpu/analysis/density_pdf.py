"""Registered density_pdf analysis: forwards to the active mesh
(registration pattern: fava/analysis/__init__.py; the analysis itself
is beyond the reference)."""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def density_pdf(self, *args, **kwargs):
    return self.mesh.density_pdf(*args, **kwargs)
