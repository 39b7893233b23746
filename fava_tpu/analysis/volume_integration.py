"""Registered volume_integration analysis: forwards to the active mesh
(reference pattern: fava/analysis/volume_integration.py)."""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def volume_integration(self, *args, **kwargs):
    return self.mesh.volume_integration(*args, **kwargs)
