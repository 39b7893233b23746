"""Edge cases: indivisible shapes on a mesh, combined load types, misc."""

import numpy as np
import pytest

import fava_tpu
from fava_tpu.io import synthetic
from fava_tpu.mesh import FlashUniform
from fava_tpu.parallel import use_mesh


def test_indivisible_volume_on_mesh_replicates(tmp_path, eight_device_mesh):
    # 12 is not divisible by 8: the load must replicate, and spectra
    # must still run (plain fftn fallback) and match the unsharded result.
    path = synthetic.make_uniform_file(tmp_path / "rt_hdf5_uniform_0001", ncells=(12, 12, 12))
    mesh0 = FlashUniform(path)
    mesh0.load()
    spec0 = mesh0.kinetic_energy_spectra()

    with use_mesh(eight_device_mesh):
        mesh1 = FlashUniform(path)
        mesh1.load()
        assert len(mesh1.data("dens").sharding.device_set) == 1  # replicated-single
        spec1 = mesh1.kinetic_energy_spectra()

    np.testing.assert_allclose(spec1["total"], spec0["total"], rtol=1e-9, atol=1e-18)


def test_chk_prt_combined_load(tmp_path):
    # A chk file that also carries particles: both mesh and particles load.
    import h5py

    chk = synthetic.make_amr_file(
        tmp_path / "rt_hdf5_chk_0001", ncells=(4, 4, 4), nblks=(1, 1, 1)
    )
    prt = synthetic.make_particle_file(tmp_path / "tmp_hdf5_part_0001", nparticles=8)
    # Merge the particle datasets into the chk file.
    with h5py.File(prt, "r") as src, h5py.File(chk, "a") as dst:
        for key in ("localnp", "particle names", "tracer particles"):
            dst.copy(src[key], key)
        # particle metadata tables already exist in the chk (scalars).
    (tmp_path / "tmp_hdf5_part_0001").unlink()

    m = fava_tpu.FLASH(tmp_path)
    m.load(file_type="chk_prt")
    assert m.mesh is not None and m.particles is not None
    assert m.particles.data["tag"].shape == (8,)


def test_uniform_mass_fraction(uniform_file):
    mesh = FlashUniform(uniform_file)
    mesh.load()
    dens = np.asarray(mesh.data("dens"))
    masks = {"hot": dens > dens.mean()}
    out = mesh.mass_fraction(masks)
    np.testing.assert_allclose(out["total"], dens.sum() * mesh.cell_volume_min, rtol=1e-10)
    assert 0 < out["hot"] < out["total"]


def test_volume_ops_on_uniform(uniform_file):
    mesh = FlashUniform(uniform_file)
    mesh.load()
    vi = mesh.volume_integration("dens")
    va = mesh.volume_average("dens")
    dens = np.asarray(mesh.data("dens"))
    np.testing.assert_allclose(vi, dens.mean() * mesh.domain_volume, rtol=1e-10)
    np.testing.assert_allclose(va, dens.mean(), rtol=1e-10)


def test_debug_toggles():
    import jax

    from fava_tpu.utils import debug

    debug.enable_checks(nan_checks=True)
    assert jax.config.jax_debug_nans
    debug.disable_checks()
    assert not jax.config.jax_debug_nans
