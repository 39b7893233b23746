"""2D dataset support: spectra, profiles, fractal on (nx, ny, 1) data."""

import numpy as np
import pytest

import fava_tpu
from fava_tpu.io import synthetic
from fava_tpu.mesh import FlashUniform
from tests.oracles.spectra import ke_spectra_oracle


@pytest.fixture()
def mesh2d(tmp_path):
    rng = np.random.default_rng(4)
    n = 16
    fields = {
        "dens": np.abs(1.0 + 0.2 * rng.standard_normal((n, n, 1))),
        "velx": rng.standard_normal((n, n, 1)),
        "vely": rng.standard_normal((n, n, 1)),
        "flam": rng.random((n, n, 1)),
    }
    path = synthetic.make_uniform_file(
        tmp_path / "rt_hdf5_uniform_0001", ncells=(n, n, 1), field_data=fields, ndim=2
    )
    mesh = FlashUniform(path)
    mesh.load()
    return mesh


def test_2d_metadata(mesh2d):
    assert mesh2d.ndim == 2
    assert tuple(mesh2d.nCellsVec) == (16, 16, 1)


def test_2d_spectra_match_oracle(mesh2d):
    spec = mesh2d.kinetic_energy_spectra()
    dens = np.asarray(mesh2d.data("dens"), dtype=np.float64)[:, :, 0]
    vels = [np.asarray(mesh2d.data(f"vel{a}"), dtype=np.float64)[:, :, 0] for a in "xy"]
    ref = ke_spectra_oracle(dens, vels)
    np.testing.assert_allclose(spec["k"], ref["k"])
    np.testing.assert_allclose(spec["total"], ref["total"], rtol=1e-9, atol=1e-18)
    # 2D integral factor is k * 2*pi (d-1 = 1), not k^2 * 4*pi.
    with np.errstate(invalid="ignore"):
        ratio = spec["total"][1:] / np.where(ref["total"][1:] != 0, ref["total"][1:], np.nan)
    assert np.nanmax(np.abs(ratio - 1)) < 1e-9


def test_2d_reynolds_stress_keys(mesh2d):
    radius, stress, means = mesh2d.reynolds_stress()
    assert set(stress.keys()) == {"Rxx", "Rxy", "Ryy"}
    assert set(means.keys()) == {"dens", "velx", "vely"}
    assert np.isfinite(stress["Rxx"]).all()


def test_2d_slice_average_constant(mesh2d):
    import jax.numpy as jnp

    mesh2d._data["one_"] = jnp.ones_like(mesh2d.data("dens"))
    mesh2d.fields = list(mesh2d.fields) + ["one_"]
    span, avg = mesh2d.slice_average("one_", axis=0)
    np.testing.assert_allclose(avg, 1.0, rtol=1e-12)


def test_2d_fractal_dimension(mesh2d):
    out = mesh2d.fractal_dimension(field="flam", contours=0.5)
    assert np.isfinite(out["flam"]["0.5"]["average fractal dimension"])


def test_2d_velocity_diagnostics(mesh2d):
    from tests.oracles import velocity as vel_oracle

    vels = [np.asarray(mesh2d.data(f"vel{a}"), dtype=np.float64)[:, :, 0] for a in "xy"]
    lengths = mesh2d._domain_lengths()
    assert len(lengths) == 2

    hd = mesh2d.helmholtz_decomposition()
    sol_ref, comp_ref = vel_oracle.helmholtz_oracle(vels, lengths)
    for i, name in enumerate(("velx", "vely")):
        np.testing.assert_allclose(hd["compressive"][name], comp_ref[i], rtol=1e-9, atol=1e-10)
    assert set(hd["solenoidal"]) == {"velx", "vely"}

    vort = mesh2d.vorticity()
    assert set(vort) == {"vortz"}
    np.testing.assert_allclose(
        vort["vortz"], vel_oracle.vorticity_2d_oracle(vels, lengths), rtol=1e-9, atol=1e-9
    )

    dil = mesh2d.dilatation()["dilatation"]
    np.testing.assert_allclose(
        dil, vel_oracle.dilatation_oracle(vels, lengths), rtol=1e-9, atol=1e-9
    )

    ens = mesh2d.enstrophy_spectra()
    ref = vel_oracle.enstrophy_spectrum_2d_oracle(vels, lengths)
    np.testing.assert_allclose(ens["power"], ref["power"], rtol=1e-9, atol=1e-15)

    with pytest.raises(ValueError):
        mesh2d.helicity_spectra()


def test_2d_filtered_ke_flux_matches_squeezed_op(mesh2d):
    # Regression: the mesh wrapper passed an unsqueezed (n, n, 1) dens
    # alongside squeezed (n, n) velocities — rho*v broadcast into a
    # bogus (n, n, n) 3D volume and Pi_l came out wrong by orders of
    # magnitude with no error.
    import jax.numpy as jnp

    from fava_tpu.ops import coarse_grain as cg_ops

    got = mesh2d.filtered_kinetic_energy_flux(cutoffs=(3.0, 5.0))
    dens = jnp.asarray(np.asarray(mesh2d.data("dens"))[:, :, 0])
    vels = [jnp.asarray(np.asarray(mesh2d.data(f"vel{a}"))[:, :, 0]) for a in "xy"]
    ref = cg_ops.filtered_ke_flux(
        *vels, dens=dens, cutoffs=(3.0, 5.0), lengths=mesh2d._domain_lengths()
    )
    np.testing.assert_allclose(got["pi_mean"], ref["pi_mean"], rtol=1e-12)
    np.testing.assert_allclose(got["pi_rms"], ref["pi_rms"], rtol=1e-12)


def test_2d_decomposed_weighted_spectra(mesh2d):
    # Regression: weighted=True raised on every 2D dataset (unsqueezed
    # dens failed the op's shape check).
    from tests.oracles import velocity as vel_oracle

    out = mesh2d.decomposed_kinetic_energy_spectra(weighted=True)
    np.testing.assert_allclose(
        out["total"], out["solenoidal"] + out["compressive"], rtol=1e-12, atol=1e-14
    )
    dens = np.asarray(mesh2d.data("dens"), dtype=np.float64)[:, :, 0]
    vels = [np.asarray(mesh2d.data(f"vel{a}"), dtype=np.float64)[:, :, 0] for a in "xy"]
    ref = vel_oracle.decomposed_ke_spectra_oracle(vels, dens, mesh2d._domain_lengths())
    np.testing.assert_allclose(out["total"], ref["total"], rtol=1e-9, atol=1e-15)


def test_2d_projection_column_profile(mesh2d):
    out = mesh2d.projection(field="dens", axis=0)
    dens = np.asarray(mesh2d.data("dens"), dtype=np.float64)[:, :, 0]
    dx = mesh2d._domain_lengths()[0] / dens.shape[0]
    np.testing.assert_allclose(out["map"], dens.sum(axis=0) * dx, rtol=1e-9)
    assert "coord2" not in out and out["coord1"].size == dens.shape[1]
