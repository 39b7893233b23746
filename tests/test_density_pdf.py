"""density_pdf: lognormality diagnostics of s = ln(rho/<rho>).

Beyond the reference (its pdf wrappers are declared-but-absent); the
oracle is plain weighted NumPy f64 on the same draws.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fava_tpu.ops import volume as volume_ops


def _oracle(rho, w=None):
    rho = rho.astype(np.float64).ravel()
    w = np.ones_like(rho) if w is None else w.astype(np.float64).ravel()
    rho_mean = (w * rho).sum() / w.sum()
    s = np.log(rho / rho_mean)
    mu = (w * s).sum() / w.sum()
    d = s - mu
    m2 = (w * d**2).sum() / w.sum()
    m3 = (w * d**3).sum() / w.sum()
    m4 = (w * d**4).sum() / w.sum()
    sig = np.sqrt(m2)
    return {
        "rho_mean": rho_mean,
        "mean_s": mu,
        "sigma_s": sig,
        "skewness": m3 / sig**3,
        "excess_kurtosis": m4 / sig**4 - 3.0,
        "lognormal_residual": abs(mu + 0.5 * sig**2),
        "s": s,
    }


def _lognormal_field(n=32, sigma0=0.8, seed=11):
    rng = np.random.default_rng(seed)
    s = rng.normal(-0.5 * sigma0**2, sigma0, size=(n, n, n))
    return np.exp(s)


def test_moments_match_weighted_numpy_oracle():
    rho = _lognormal_field()
    got = volume_ops.density_pdf(jnp.asarray(rho), nbins=64)
    ref = _oracle(rho)
    for name in (
        "rho_mean",
        "mean_s",
        "sigma_s",
        "skewness",
        "excess_kurtosis",
        "lognormal_residual",
    ):
        np.testing.assert_allclose(got[name], ref[name], rtol=1e-9, atol=1e-12, err_msg=name)
    # A genuine lognormal sample: residual is small (sampling noise).
    assert got["lognormal_residual"] < 0.05
    assert abs(got["skewness"]) < 0.1


def test_histogram_matches_numpy_on_same_edges():
    rho = _lognormal_field(seed=12)
    w = 1.0 + 0.5 * np.random.default_rng(13).random(rho.shape)
    got = volume_ops.density_pdf(jnp.asarray(rho), weights=jnp.asarray(w), nbins=48)
    ref = _oracle(rho, w)
    counts, edges = np.histogram(ref["s"], bins=48, range=(got["edges"][0], got["edges"][-1]), weights=w.ravel())
    np.testing.assert_allclose(got["edges"], edges, rtol=1e-12)
    # bin-boundary rounding can move single samples; compare totals and
    # the bulk of the distribution
    np.testing.assert_allclose(got["counts"].sum(), counts.sum(), rtol=1e-9)
    assert np.abs(got["counts"] - counts).max() <= max(1e-6, np.abs(w).max())
    # density normalization integrates to ~1 over the covered range
    np.testing.assert_allclose(
        (got["pdf"] * np.diff(got["edges"])).sum(), 1.0, rtol=1e-9
    )


def test_fixed_srange_and_b_parameter_identity():
    rho = _lognormal_field(seed=14)
    got = volume_ops.density_pdf(jnp.asarray(rho), nbins=32, srange=(-2.0, 2.0), mach=2.0)
    np.testing.assert_allclose(got["edges"][0], -2.0)
    np.testing.assert_allclose(got["edges"][-1], 2.0)
    # sigma_s^2 = ln(1 + b^2 M^2)  =>  b = sqrt(expm1(sigma^2)) / M
    np.testing.assert_allclose(
        got["b_parameter"], np.sqrt(np.expm1(got["sigma_s"] ** 2)) / 2.0, rtol=1e-12
    )


def test_validation_and_constant_field():
    rho = jnp.ones((8, 8, 8))
    out = volume_ops.density_pdf(rho, nbins=16)
    assert out["sigma_s"] == 0.0
    assert np.isfinite(out["pdf"]).all()
    assert out["lognormal_residual"] == 0.0
    with pytest.raises(ValueError, match="weights shape"):
        volume_ops.density_pdf(rho, weights=jnp.ones((8, 8)))
    with pytest.raises(ValueError, match="mach"):
        volume_ops.density_pdf(rho, mach=0.0)
    with pytest.raises(ValueError, match="nbins"):
        volume_ops.density_pdf(rho, nbins=0)


def test_mesh_wrappers_and_registration(uniform_file, amr_file):
    import fava_tpu
    from fava_tpu.mesh import FLASH as FlashAMR
    from fava_tpu.mesh import FlashUniform

    mesh = FlashUniform(uniform_file)
    mesh.load()
    got = mesh.density_pdf(nbins=32)
    dens = np.asarray(mesh.data("dens"), dtype=np.float64)
    ref = _oracle(dens)
    np.testing.assert_allclose(got["sigma_s"], ref["sigma_s"], rtol=1e-9)
    # mass weighting = dens-weighted moments
    got_m = mesh.density_pdf(weight="mass", nbins=32)
    ref_m = _oracle(dens, dens)
    np.testing.assert_allclose(got_m["sigma_s"], ref_m["sigma_s"], rtol=1e-9)
    # uniform-mesh pdf1d (new): matches np.histogram
    p1 = mesh.pdf1d("dens", nbins=16)
    counts, _ = np.histogram(dens, bins=16, range=(p1["edges"][0], p1["edges"][-1]))
    np.testing.assert_allclose(p1["counts"].sum(), counts.sum(), rtol=1e-12)

    amr = FlashAMR(amr_file)
    amr.load()
    amr.load_data(["dens"])
    got_a = amr.density_pdf(nbins=32)
    leaf = np.asarray(amr.get_blocklist("LEAF"))
    cv = np.asarray(amr.get_cell_volumes("LEAF"), dtype=np.float64)
    dh = np.asarray(amr.host_data("dens"), dtype=np.float64)[leaf]
    w = np.broadcast_to(cv.reshape(-1, 1, 1, 1), dh.shape)
    ref_a = _oracle(dh, w)
    np.testing.assert_allclose(got_a["sigma_s"], ref_a["sigma_s"], rtol=1e-9)
    np.testing.assert_allclose(got_a["mean_s"], ref_a["mean_s"], rtol=1e-9, atol=1e-12)

    m = fava_tpu.FLASH(uniform_file.parent)
    m.load(file_type="uni")
    assert hasattr(m, "density_pdf")
    out = m.density_pdf(nbins=16)
    assert "b_parameter" not in out
