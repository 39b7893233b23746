"""Registered particle-pair structure-function analysis: forwards to
the loaded particle table (registration pattern:
fava/analysis/__init__.py; the analysis itself is beyond the
reference)."""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def particle_structure_functions(self, *args, **kwargs):
    if getattr(self, "particles", None) is None:
        raise AttributeError(
            "particle_structure_functions needs a loaded particle table: "
            "model.load(file_type='prt') first"
        )
    return self.particles.structure_functions(*args, **kwargs)
