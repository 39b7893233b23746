"""Model-level flame surface density wrapper (registered analysis).

Beyond the reference: coarea-formula front area, wrinkling factor, and
slab-resolved surface density profile of a progress variable
(ops/flame.flame_surface); the reference probes the front only via the
fractal dimension of one isosurface (fava/analysis/fractal_dimension.py).
"""

from fava_tpu.models.model import Model


@Model.register_analysis(use_timer=True)
def flame_surface(self, *args, **kwargs):
    return self.mesh.flame_surface(*args, **kwargs)
