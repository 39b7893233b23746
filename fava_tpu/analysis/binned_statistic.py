"""Registered conditional-statistics analysis (beyond the reference:
it leans on scipy.stats.binned_statistic internally — reference
fava/mesh/FLASH/FlashUniform.py:260-304 — but exposes no
conditional-statistics call). Uniform meshes compute unweighted
statistics (equal cell volumes); AMR meshes weight by leaf cell
volume (or mass) like pdf1d/pdf2d."""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def binned_statistic(self, *args, **kwargs):
    return self.mesh.binned_statistic(*args, **kwargs)
