"""Registered structure_functions analysis: forwards to the active mesh
(reference pattern: fava/analysis/structure_functions.py)."""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def structure_functions(self, *args, **kwargs):
    return self.mesh.structure_functions(*args, **kwargs)


@Model.register_analysis(use_timer=True)
def velocity_increment_pdfs(self, *args, **kwargs):
    """Signed velocity-increment PDFs vs separation (beyond the
    reference; see ops.structure.velocity_increment_pdfs)."""
    return self.mesh.velocity_increment_pdfs(*args, **kwargs)
