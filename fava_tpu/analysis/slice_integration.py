"""Registered slice_integration analysis: forwards to the active mesh
(reference pattern: fava/analysis/slice_integration.py)."""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def slice_integration(self, *args, **kwargs):
    return self.mesh.slice_integration(*args, **kwargs)
