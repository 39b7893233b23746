"""Registered favre_profiles analysis: Favre (density-weighted) means and
mass-weighted RMS fluctuations. New in the rebuild (BASELINE config #3);
the reference has no Favre-averaging support."""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def favre_profiles(self, *args, **kwargs):
    return self.mesh.favre_profiles(*args, **kwargs)
