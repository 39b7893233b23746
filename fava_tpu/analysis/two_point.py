"""Registered spatial two-point correlation analyses: forward to the
active mesh (registration pattern: fava/analysis/__init__.py; the
analyses themselves are beyond the reference — its auto_correlations
are TIME correlations at sampled points)."""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def two_point_correlation(self, *args, **kwargs):
    return self.mesh.two_point_correlation(*args, **kwargs)


@Model.register_analysis(use_timer=True)
def velocity_correlations(self, *args, **kwargs):
    return self.mesh.velocity_correlations(*args, **kwargs)
