"""Conditional bin statistics: scipy.binned_statistic oracle, exact
counts, closed forms, mesh/analysis routing."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from fava_tpu.ops import volume as vol


def test_matches_scipy_binned_statistic():
    rng = np.random.default_rng(41)
    x = rng.normal(0.0, 1.5, 20001)
    y = 3.0 * x + rng.normal(0.0, 0.3, x.size)
    out = vol.binned_statistic(jnp.asarray(x), jnp.asarray(y), nbins=12)
    for stat, key in (("count", "counts"), ("mean", "mean"), ("std", "std")):
        ref = scipy.stats.binned_statistic(x, y, statistic=stat, bins=12)
        np.testing.assert_allclose(
            out[key][~np.isnan(out[key])] if key != "counts" else out[key],
            ref.statistic[~np.isnan(ref.statistic)] if key != "counts" else ref.statistic,
            rtol=1e-10,
            err_msg=stat,
        )
        np.testing.assert_allclose(out["edges"], ref.bin_edges, rtol=0, atol=0)
    np.testing.assert_array_equal(out["counts"], np.round(out["counts"]))
    assert out["counts"].sum() == x.size  # auto range keeps every sample


def test_fixed_range_and_empty_bins():
    x = np.array([0.1, 0.1, 0.9, 2.5])  # 2.5 out of range
    y = np.array([1.0, 3.0, 5.0, 100.0])
    out = vol.binned_statistic(
        jnp.asarray(x), jnp.asarray(y), nbins=4, vrange=(0.0, 1.0)
    )
    np.testing.assert_array_equal(out["counts"], [2, 0, 0, 1])
    np.testing.assert_allclose(out["mean"][0], 2.0)
    np.testing.assert_allclose(out["std"][0], 1.0)
    assert np.isnan(out["mean"][1]) and np.isnan(out["std"][2])
    np.testing.assert_allclose(out["mean"][3], 5.0)
    np.testing.assert_allclose(out["std"][3], 0.0)


def test_large_mean_cancellation_guard():
    # y carries a huge common offset; per-bin std must survive the
    # one-pass variance because y is centered by its global mean first
    rng = np.random.default_rng(42)
    x = rng.uniform(0.0, 1.0, 4096)
    y = 1.0e7 + np.sin(2.0 * np.pi * x)
    out = vol.binned_statistic(jnp.asarray(x), jnp.asarray(y), nbins=8)
    ref = scipy.stats.binned_statistic(x, y, statistic="std", bins=out["edges"])
    np.testing.assert_allclose(out["std"], ref.statistic, rtol=1e-6)


def test_validation_errors():
    x = jnp.asarray(np.ones(8))
    with pytest.raises(ValueError, match="vrange"):
        vol.binned_statistic(x, x, nbins=4, vrange=(1.0, 1.0))
    with pytest.raises(ValueError, match="shape"):
        vol.binned_statistic(x, jnp.asarray(np.ones(9)))
    with pytest.raises(ValueError, match="nbins"):
        vol.binned_statistic(x, x, nbins=0)


def test_mesh_and_registration(tmp_path):
    from fava_tpu.io import synthetic
    import fava_tpu

    synthetic.make_uniform_file(tmp_path / "rt_hdf5_uniform_0001", ncells=(8, 8, 8), seed=3)
    m = fava_tpu.FLASH(tmp_path)
    m.load(file_type="uni")
    out = m.binned_statistic("dens", "velx", nbins=6)
    assert out["counts"].sum() == 8**3
    xv = np.asarray(m.mesh.data("dens"), dtype=np.float64).ravel()
    yv = np.asarray(m.mesh.data("velx"), dtype=np.float64).ravel()
    ref = scipy.stats.binned_statistic(xv, yv, statistic="mean", bins=out["edges"])
    got, want = out["mean"], ref.statistic
    mask = ~np.isnan(want)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-10)

    # AMR twin: volume-weighted conditional statistics over leaf cells
    synthetic.make_amr_file(
        tmp_path / "rt_hdf5_plt_cnt_0001", ncells=(4, 4, 4), nblks=(2, 2, 2), refine={0: 2}
    )
    m2 = fava_tpu.FLASH(tmp_path)
    m2.load(file_type="plt")
    out2 = m2.binned_statistic("dens", "velx", nbins=5)
    xv2 = np.asarray(m2.mesh._leaf_stack("dens"), dtype=np.float64).ravel()
    yv2 = np.asarray(m2.mesh._leaf_stack("velx"), dtype=np.float64).ravel()
    cv = np.asarray(m2.mesh.get_cell_volumes("LEAF"), dtype=np.float64)
    w2 = np.broadcast_to(cv[:, None, None, None], m2.mesh._leaf_stack("dens").shape).ravel()
    assert out2["counts"].sum() == xv2.size
    idx = np.clip(np.searchsorted(out2["edges"], xv2, side="right") - 1, 0, 4)
    for b in range(5):
        sel = idx == b
        if not sel.any():
            assert np.isnan(out2["mean"][b])
            continue
        want = np.sum(w2[sel] * yv2[sel]) / np.sum(w2[sel])
        np.testing.assert_allclose(out2["mean"][b], want, rtol=1e-10, err_msg=f"bin {b}")
    np.testing.assert_allclose(out2["weight_sums"].sum(), w2.sum(), rtol=1e-12)
