"""In-memory from_arrays handle: every uniform analysis on plain arrays."""

import numpy as np
import pytest

import fava_tpu


@pytest.fixture(scope="module")
def arrays():
    rng = np.random.default_rng(41)
    n = 16
    return {
        "dens": 1.0 + 0.4 * rng.random((n, n, n)),
        "velx": rng.standard_normal((n, n, n)),
        "vely": rng.standard_normal((n, n, n)),
        "velz": rng.standard_normal((n, n, n)),
        "flam": rng.random((n, n, n)),
    }


def test_analyses_match_file_backed(arrays, tmp_path):
    from fava_tpu.io import synthetic

    m = fava_tpu.from_arrays(arrays, domain_bounds=[[0, 2.0], [0, 1.0], [0, 1.0]])
    # same data through the file path
    path = tmp_path / "rt_hdf5_uniform_0001"
    synthetic.make_uniform_file(
        path, ncells=(16, 16, 16), field_data=arrays,
        domain=np.asarray([[0, 2.0], [0, 1.0], [0, 1.0]], dtype=np.float64),
    )
    mf = fava_tpu.FLASH(tmp_path)
    mf.load(file_type="uni")

    spec_a = m.kinetic_energy_spectra()
    spec_f = mf.kinetic_energy_spectra()
    np.testing.assert_allclose(spec_a["total"], spec_f["total"], rtol=1e-6)
    ts_a = m.turbulence_summary()
    ts_f = mf.turbulence_summary()
    for k, v in ts_f.items():
        np.testing.assert_allclose(ts_a[k], v, rtol=1e-6, err_msg=k)
    np.testing.assert_allclose(
        m.density_pdf(nbins=16)["sigma_s"], mf.density_pdf(nbins=16)["sigma_s"], rtol=1e-6
    )
    np.testing.assert_allclose(
        m.projection(field="dens")["map"], mf.projection(field="dens")["map"], rtol=1e-6
    )
    vc_a = m.velocity_correlations()
    vc_f = mf.velocity_correlations()
    np.testing.assert_allclose(vc_a["L11_x"], vc_f["L11_x"], rtol=1e-6)
    fd = m.fractal_dimension(field="flam", contours=0.5)
    assert np.isfinite(fd["flam"]["0.5"]["average fractal dimension"])


def test_2d_and_validation(arrays):
    rng = np.random.default_rng(42)
    two_d = {"dens": 1.0 + rng.random((8, 8)), "velx": rng.standard_normal((8, 8)),
             "vely": rng.standard_normal((8, 8))}
    m2 = fava_tpu.from_arrays(two_d)
    assert m2.mesh.ndim == 2
    out = m2.kinetic_energy_spectra()
    assert np.isfinite(out["total"][1:]).any()

    with pytest.raises(ValueError, match="one shape"):
        fava_tpu.from_arrays({"dens": np.ones((4, 4)), "velx": np.ones((4, 5))})
    with pytest.raises(ValueError, match="domain_bounds"):
        fava_tpu.from_arrays({"dens": np.ones((4, 4))}, domain_bounds=[[0, 1]])
    with pytest.raises(NotImplementedError):
        fava_tpu.from_arrays({"dens": np.ones((4, 4, 4))}).load()
    with pytest.raises(ValueError, match="file-backed"):
        fava_tpu.from_arrays(
            {"dens": np.ones((8, 8, 8)), "velx": np.ones((8, 8, 8)),
             "vely": np.ones((8, 8, 8)), "velz": np.ones((8, 8, 8))}
        ).turbulence_summary(streamed=True)
