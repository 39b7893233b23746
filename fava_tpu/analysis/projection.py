"""Registered projection analysis: forwards to the active mesh
(registration pattern: fava/analysis/__init__.py; the analysis itself
is beyond the reference — no projection/column-map product exists)."""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def projection(self, *args, **kwargs):
    return self.mesh.projection(*args, **kwargs)
