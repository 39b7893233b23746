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


@pytest.mark.parametrize("shape", [(12, 10, 14), (9, 11, 7)])
def test_flagship_noncubic_and_odd_extents_match_oracle(shape):
    """The fused flagship step on non-cubic and fully ODD extents (the
    binning kernels' fold/Nyquist special cases all differ there) must
    match a direct f64 NumPy implementation of the reference algorithms."""
    import jax.numpy as jnp

    from fava_tpu.flagship import uniform_analysis_step

    rng = np.random.default_rng(3)
    dens = 1.0 + 0.2 * rng.random(shape)
    vels = [rng.standard_normal(shape) for _ in range(3)]

    out = uniform_analysis_step(
        jnp.asarray(dens), *(jnp.asarray(v) for v in vels), mesh=None
    )
    out = {k: np.asarray(v, dtype=np.float64) for k, v in out.items()}

    # f64 oracle: full-grid FFT shell sums + centered x-profiles.
    nbins = max(shape) // 2 - 1
    ntot = dens.size

    def wn(m):
        k = np.arange(m)
        return np.where(k <= (m - 1) // 2, k, k - m).astype(np.float64)

    kx = wn(shape[0])[:, None, None]
    ky = wn(shape[1])[None, :, None]
    kz = wn(shape[2])[None, None, :]
    k_abs = np.sqrt(kx**2 + ky**2 + kz**2)
    sd = np.sqrt(dens)
    total = np.zeros(shape)
    longi = np.zeros(shape, dtype=np.complex128)
    for k, v in zip((kx, ky, kz), vels):
        f = np.fft.fftn(sd * v, norm="forward")
        total += 0.5 * np.abs(f) ** 2
        longi += k * f
    longi_p = np.abs(longi / np.maximum(k_abs, 1e-99)) ** 2
    idx = np.clip(np.floor(k_abs + 0.5).astype(int), 0, nbins - 1).ravel()
    mask = (k_abs <= nbins - 0.5).ravel()
    counts = np.bincount(idx, weights=mask.astype(float), minlength=nbins)[:nbins]
    t_sum = np.bincount(idx, weights=np.where(mask, total.ravel(), 0), minlength=nbins)[:nbins]
    l_sum = np.bincount(idx, weights=np.where(mask, longi_p.ravel(), 0), minlength=nbins)[:nbins]

    np.testing.assert_allclose(out["spectra_counts"], counts)
    np.testing.assert_allclose(out["spectra_total"], t_sum, rtol=1e-9, atol=1e-20)
    np.testing.assert_allclose(out["spectra_longitudinal"], l_sum, rtol=1e-9, atol=1e-20)
    np.testing.assert_allclose(
        out["spectra_transverse"], t_sum - l_sum, rtol=1e-9, atol=1e-18
    )

    layer = shape[1] * shape[2]
    d_row = dens.sum(axis=(1, 2))
    means = [v.sum(axis=(1, 2)) / layer for v in vels]
    pairs = [(i, j) for i in range(3) for j in range(i, 3)]
    cv = [v - m[:, None, None] for v, m in zip(vels, means)]
    stress = np.stack([(dens * cv[i] * cv[j]).sum(axis=(1, 2)) / layer for i, j in pairs])
    np.testing.assert_allclose(out["reynolds_stress"], stress, rtol=1e-9)
    np.testing.assert_allclose(out["total_mass"], dens.sum(), rtol=1e-12)
