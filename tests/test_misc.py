"""Small remaining coverage: geometry enums, profiling helpers, version."""

import numpy as np
import pytest

import fava_tpu
from fava_tpu.geometry import AXIS, CARTESIAN, CYLINDRICAL, EDGE, GEOMETRY, POLAR, SPHERICAL


def test_version():
    assert fava_tpu.__version__
    assert isinstance(fava_tpu.__version_tuple__, tuple)


def test_geometry_enums():
    assert AXIS.I == 0 and AXIS.J == 1 and AXIS.K == 2
    assert GEOMETRY("cartesian") is GEOMETRY.CARTESIAN
    assert CARTESIAN.Z == 2
    assert CYLINDRICAL.RADIUS == 0
    assert SPHERICAL.PHI == 2
    assert POLAR.THETA == 1
    assert {EDGE.LEFT, EDGE.CENTER, EDGE.RIGHT} == set(EDGE)


def test_profiling_annotate_and_trace(tmp_path):
    from fava_tpu.utils import profiling

    with profiling.annotate("test-span"):
        pass

    import jax.numpy as jnp

    with profiling.device_trace(tmp_path / "trace") as logdir:
        _ = jnp.sum(jnp.arange(16.0))
    assert (tmp_path / "trace").exists()


def test_non_cartesian_domain_volume_raises(tmp_path):
    from fava_tpu.io import synthetic
    from fava_tpu.mesh import FlashUniform

    path = synthetic.make_uniform_file(tmp_path / "rt_hdf5_uniform_0001", ncells=(4, 4, 4))
    mesh = FlashUniform(path)
    mesh.load()
    mesh.scalars["string"]["geometry"] = "spherical"
    mesh._delete_cached_properties()
    with pytest.raises(NotImplementedError):
        _ = mesh.domain_volume


def test_timings_registry_roundtrip():
    from fava_tpu.utils import reset_timings, timings, trace

    reset_timings()
    with trace("roundtrip"):
        pass
    assert "roundtrip" in timings()
    reset_timings()
    assert "roundtrip" not in timings()
