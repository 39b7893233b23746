"""Registered fractal_dimension analysis: forwards to the active mesh
(reference pattern: fava/analysis/fractal_dimension.py)."""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def fractal_dimension(self, *args, **kwargs):
    return self.mesh.fractal_dimension(*args, **kwargs)
