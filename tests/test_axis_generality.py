"""Profile analyses must honor the requested axis (the reference
hardcodes axis 0 — SURVEY §2 #9/#10 caveat; we fix it)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fava_tpu.mesh import FlashUniform


@pytest.fixture()
def uni_mesh(tmp_path):
    from fava_tpu.io import synthetic

    path = tmp_path / "rt_hdf5_uniform_0001"
    synthetic.make_uniform_file(path, ncells=(16, 16, 16), seed=21)
    mesh = FlashUniform(path)
    mesh.load()
    return mesh


def _transposed_mesh(mesh, tmp_path, perm, vel_perm):
    """Build a mesh whose data is the axis-permuted copy of ``mesh``."""
    from fava_tpu.io import synthetic

    fields = {}
    for name in mesh.fields:
        vol = np.asarray(mesh.data(name), dtype=np.float64)
        fields[name] = np.transpose(vol, perm)
    # Swap velocity component names to follow the axis permutation.
    renamed = dict(fields)
    for i, a in enumerate("xyz"):
        renamed[f"vel{a}"] = fields[f"vel{'xyz'[vel_perm[i]]}"]
    path = tmp_path / "tp_hdf5_uniform_0001"
    synthetic.make_uniform_file(path, ncells=fields["dens"].shape, field_data=renamed)
    m = FlashUniform(path)
    m.load()
    return m


def test_reynolds_axis1_equals_transposed_axis0(uni_mesh, tmp_path):
    # Profile along y == profile along x of the (y,x,z)-transposed data
    # with velx<->vely swapped.
    radius1, stress1, means1 = uni_mesh.reynolds_stress(raxis=1)

    mesh_t = _transposed_mesh(uni_mesh, tmp_path, perm=(1, 0, 2), vel_perm=(1, 0, 2))
    radius0, stress0, means0 = mesh_t.reynolds_stress(raxis=0)

    np.testing.assert_allclose(radius1, radius0)
    np.testing.assert_allclose(means1["dens"], means0["dens"], rtol=1e-11)
    np.testing.assert_allclose(means1["vely"], means0["velx"], rtol=1e-11)
    np.testing.assert_allclose(stress1["Ryy"], stress0["Rxx"], rtol=1e-10)
    np.testing.assert_allclose(stress1["Rxx"], stress0["Ryy"], rtol=1e-10)
    np.testing.assert_allclose(stress1["Rzz"], stress0["Rzz"], rtol=1e-10)
    np.testing.assert_allclose(stress1["Ryz"], stress0["Rxz"], rtol=1e-10)


def test_slice_average_axis2_equals_transposed_axis0(uni_mesh, tmp_path):
    span2, avg2 = uni_mesh.slice_average("dens", axis=2)
    mesh_t = _transposed_mesh(uni_mesh, tmp_path, perm=(2, 1, 0), vel_perm=(2, 1, 0))
    span0, avg0 = mesh_t.slice_average("dens", axis=0)
    np.testing.assert_allclose(span2, span0)
    np.testing.assert_allclose(avg2, avg0, rtol=1e-11)


def test_favre_axis_generality(uni_mesh, tmp_path):
    out1 = uni_mesh.favre_profiles(raxis=1)
    mesh_t = _transposed_mesh(uni_mesh, tmp_path, perm=(1, 0, 2), vel_perm=(1, 0, 2))
    out0 = mesh_t.favre_profiles(raxis=0)
    np.testing.assert_allclose(out1["mean_dens"], out0["mean_dens"], rtol=1e-11)
    np.testing.assert_allclose(out1["favre_rms"]["vely"], out0["favre_rms"]["velx"], rtol=1e-10)
