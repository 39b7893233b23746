"""Registered structure_functions analysis: forwards to the active mesh
(reference pattern: fava/analysis/structure_functions.py)."""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def structure_functions(self, *args, **kwargs):
    return self.mesh.structure_functions(*args, **kwargs)
