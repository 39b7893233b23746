"""Registered conditional-statistics analysis (beyond the reference:
it leans on scipy.stats.binned_statistic internally — reference
fava/mesh/FLASH/FlashUniform.py:260-304 — but exposes no
conditional-statistics call). Uniform-grid meshes only; the AMR guard
mirrors the spatial-correlation analyses (ADVICE r3)."""

from fava_tpu.models.model import Model
from fava_tpu.analysis.two_point import _uniform_mesh_method


@Model.register_analysis(use_timer=True)
def binned_statistic(self, *args, **kwargs):
    return _uniform_mesh_method(self.mesh, "binned_statistic")(*args, **kwargs)
