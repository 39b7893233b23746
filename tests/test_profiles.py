"""Profile analyses vs the NumPy reference oracles (float64, tight tolerance)."""

import numpy as np
import pytest

import fava_tpu
from fava_tpu.mesh import FLASH as FlashAMR
from tests.oracles import profiles as oracle


@pytest.fixture(scope="module")
def amr_mesh(tmp_path_factory):
    from fava_tpu.io import synthetic

    path = tmp_path_factory.mktemp("prof") / "rt_hdf5_plt_cnt_0001"
    synthetic.make_amr_file(path, ncells=(8, 8, 8), nblks=(2, 2, 2), refine={0: 2, 7: 3})
    mesh = FlashAMR(path)
    mesh.load()
    mesh.load_data(["dens", "velx", "vely", "velz", "flam"])
    return mesh


def _oracle_kwargs(mesh):
    return dict(
        block_bounds=np.asarray(mesh.block_bounds),
        refine_level=np.asarray(mesh.refine_level),
        node_type=np.asarray(mesh.node_type),
        domain_bounds=mesh.domain_bounds,
        ncells=mesh.nCellsVec,
        nblks=mesh.nBlksVec,
    )


def test_reynolds_stress_matches_oracle(amr_mesh):
    radius, stress, means = amr_mesh.reynolds_stress(raxis=0)

    data = {k: amr_mesh.host_data(k) for k in ("dens", "velx", "vely", "velz")}
    o_radius, o_stress, o_means = oracle.reynolds_stress_oracle(
        data, raxis=0, ndim=3, **_oracle_kwargs(amr_mesh)
    )

    np.testing.assert_allclose(radius, o_radius)
    for key in o_means:
        np.testing.assert_allclose(means[key], o_means[key], rtol=1e-11, err_msg=key)
    for key in o_stress:
        np.testing.assert_allclose(
            stress[key], o_stress[key], rtol=1e-9, atol=1e-13, err_msg=key
        )


def test_reynolds_stress_keys(amr_mesh):
    _, stress, means = amr_mesh.reynolds_stress()
    assert set(stress.keys()) == {"Rxx", "Rxy", "Rxz", "Ryy", "Ryz", "Rzz"}
    assert set(means.keys()) == {"dens", "velx", "vely", "velz"}


def test_slice_integral_matches_oracle(amr_mesh):
    span, alp = amr_mesh.slice_integral("flam", axis=0)
    o_span, o_alp = oracle.slice_integral_oracle(
        amr_mesh.host_data("flam"), raxis=0, **_oracle_kwargs(amr_mesh)
    )
    np.testing.assert_allclose(span, o_span)
    np.testing.assert_allclose(alp, o_alp, rtol=1e-11)


def test_slice_average_normalization(amr_mesh):
    # A constant field's slice average equals the constant.
    const = np.ones_like(amr_mesh.host_data("dens"))
    import jax.numpy as jnp

    amr_mesh._data["one_"] = jnp.asarray(const)
    amr_mesh.fields = list(amr_mesh.fields) + ["one_"]
    span, avg = amr_mesh.slice_average("one_", axis=0)
    np.testing.assert_allclose(avg, 1.0, rtol=1e-12)


def test_slice_integral_other_axes(amr_mesh):
    # raxis=1 must profile along y (the reference hard-codes axis 0; we fix it).
    span, alp = amr_mesh.slice_integral("dens", axis=1)
    assert alp.shape == span.shape[:1] or alp.size == span.size - 1
    # Integral over all layers equals the volume integral.
    vol_int = amr_mesh.volume_integration("dens")
    min_d = amr_mesh.get_minimum_deltas(1)
    np.testing.assert_allclose(alp.sum() * min_d / min_d, vol_int / min_d * min_d, rtol=1e-10)


def test_favre_profiles_consistency(amr_mesh):
    out = amr_mesh.favre_profiles(raxis=0)
    # Favre mean of velx should lie within min/max of velx.
    vx = amr_mesh.host_data("velx")
    leaves = amr_mesh.get_blocklist("LEAF")
    assert out["favre_mean"]["velx"].min() >= vx[leaves].min() - 1e-12
    assert out["favre_mean"]["velx"].max() <= vx[leaves].max() + 1e-12
    assert (out["favre_rms"]["velx"] >= 0).all()
    # Mean density profile equals the reynolds_stress means profile.
    _, _, means = amr_mesh.reynolds_stress(raxis=0)
    np.testing.assert_allclose(out["mean_dens"], means["dens"], rtol=1e-12)


def test_volume_integration_and_average(amr_mesh):
    vi = amr_mesh.volume_integration("dens")
    va = amr_mesh.volume_average("dens")

    # Direct oracle: sum over leaves of blocksum * cellvol.
    data = amr_mesh.host_data("dens")
    leaves = amr_mesh.get_blocklist("LEAF")
    vols = amr_mesh.get_cell_volumes()
    expected = sum(data[b].sum() * v for b, v in zip(leaves, vols))
    np.testing.assert_allclose(vi, expected, rtol=1e-12)
    np.testing.assert_allclose(va, expected / amr_mesh.domain_volume, rtol=1e-12)


def test_mass_sum_with_masks(amr_mesh):
    dens = amr_mesh.host_data("dens")
    leaves = amr_mesh.get_blocklist("LEAF")
    mask = dens[leaves] > 1.0
    out = amr_mesh.mass_sum(masks={"dense": mask})
    vols = amr_mesh.get_cell_volumes()
    total = sum(dens[b].sum() * v for b, v in zip(leaves, vols))
    masked = sum((dens[b] * m).sum() * v for b, m, v in zip(leaves, mask, vols))
    np.testing.assert_allclose(out["total"], total, rtol=1e-12)
    np.testing.assert_allclose(out["dense"], masked, rtol=1e-12)


def test_pdf1d_normalization(amr_mesh):
    out = amr_mesh.pdf1d("dens", nbins=32)
    integral = (out["pdf"] * np.diff(out["edges"])).sum()
    np.testing.assert_allclose(integral, 1.0, rtol=1e-12)
    # Volume weighting: counts sum to total leaf volume.
    np.testing.assert_allclose(out["counts"].sum(), amr_mesh.domain_volume, rtol=1e-10)


def test_pdf2d_normalization(amr_mesh):
    out = amr_mesh.pdf2d("dens", "velx", nbins=(16, 16))
    area = np.outer(np.diff(out["xedges"]), np.diff(out["yedges"]))
    np.testing.assert_allclose((out["pdf"] * area).sum(), 1.0, rtol=1e-12)


def _leaf_volume_weights(mesh, shape):
    cv = np.asarray(mesh.get_cell_volumes("LEAF"), dtype=np.float64)
    return np.broadcast_to(cv.reshape((-1,) + (1,) * (len(shape) - 1)), shape)


def test_pdf1d_matches_numpy_histogram(amr_mesh):
    out = amr_mesh.pdf1d("dens", nbins=12)
    vals = np.asarray(amr_mesh._leaf_stack("dens"), dtype=np.float64)
    w = _leaf_volume_weights(amr_mesh, vals.shape)
    counts, _ = np.histogram(vals.ravel(), bins=out["edges"], weights=w.ravel())
    np.testing.assert_allclose(out["counts"], counts, rtol=1e-12, atol=1e-15)


def test_pdf2d_matches_numpy_histogram2d(amr_mesh):
    out = amr_mesh.pdf2d("dens", "velx", nbins=(8, 10))
    xv = np.asarray(amr_mesh._leaf_stack("dens"), dtype=np.float64)
    yv = np.asarray(amr_mesh._leaf_stack("velx"), dtype=np.float64)
    w = _leaf_volume_weights(amr_mesh, xv.shape).ravel()
    counts, _, _ = np.histogram2d(
        xv.ravel(), yv.ravel(), bins=[out["xedges"], out["yedges"]], weights=w
    )
    np.testing.assert_allclose(out["counts"], counts, rtol=1e-12, atol=1e-15)
