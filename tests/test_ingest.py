"""Async ingest + snapshot time-series drivers."""

import numpy as np
import pytest

import fava_tpu
from fava_tpu.io import synthetic
from fava_tpu.io.ingest import SnapshotPrefetcher, ingest_bandwidth_gbps


@pytest.fixture()
def series_dir(tmp_path):
    for i, t in enumerate([0.0, 0.1, 0.2, 0.3], start=1):
        synthetic.make_amr_file(
            tmp_path / f"rt_hdf5_plt_cnt_{i:04d}",
            ncells=(4, 4, 4),
            nblks=(2, 2, 2),
            refine={0: 2},
            time=t,
        )
    return tmp_path


def test_prefetcher_yields_all_snapshots_in_order(series_dir):
    paths = sorted(series_dir.glob("*plt_cnt*"))
    snaps = list(SnapshotPrefetcher(paths, ["dens", "velx"], depth=2))
    assert len(snaps) == 4
    np.testing.assert_allclose([s.time for s in snaps], [0.0, 0.1, 0.2, 0.3])
    for s in snaps:
        assert set(s.fields.keys()) == {"dens", "velx"}
        assert s.fields["dens"].ndim == 4
        assert s.nbytes > 0


def test_prefetcher_missing_field_handling(series_dir):
    paths = sorted(series_dir.glob("*plt_cnt*"))[:1]
    # strict (default): loud error naming the file and field
    import pytest as _pytest

    with _pytest.raises(KeyError, match="notafield"):
        list(SnapshotPrefetcher(paths, ["dens", "notafield"]))
    # opportunistic mode keeps the old skip contract
    snaps = list(SnapshotPrefetcher(paths, ["dens", "notafield"], strict=False))
    assert set(snaps[0].fields.keys()) == {"dens"}


def test_ingest_bandwidth_positive(series_dir):
    paths = sorted(series_dir.glob("*plt_cnt*"))
    gbps = ingest_bandwidth_gbps(paths, ["dens", "velx", "vely", "velz"])
    assert gbps > 0


def test_favre_series_matches_per_file(series_dir):
    m = fava_tpu.FLASH(series_dir)
    out = m.favre_series(file_type="plt")
    assert out["favre_mean_velx"].shape[0] == 4
    np.testing.assert_allclose(out["times"], [0.0, 0.1, 0.2, 0.3])

    # Cross-check snapshot 2 against the single-file mesh path.
    m.load(file_index=2, file_type="plt")
    single = m.favre_profiles(raxis=0)
    np.testing.assert_allclose(
        out["favre_mean_velx"][2], single["favre_mean"]["velx"], rtol=1e-12
    )
    np.testing.assert_allclose(
        out["favre_rms_velz"][2], single["favre_rms"]["velz"], rtol=1e-12
    )


def test_particle_series(series_dir, tmp_path):
    for i, t in enumerate([0.0, 0.1, 0.2], start=1):
        synthetic.make_particle_file(
            series_dir / f"rt_hdf5_part_{i:04d}", nparticles=32, time=t, seed=200 + i
        )
    m = fava_tpu.FLASH(series_dir)
    out = m.particle_series(fields=["velx", "dens"])
    np.testing.assert_allclose(out["times"], [0.0, 0.1, 0.2])
    assert out["velx_mean"].shape == (3,)
    assert (out["velx_rms"] > 0).all()
    assert (out["dens_max"] >= out["dens_min"]).all()


def test_reynolds_series_matches_per_file(series_dir):
    m = fava_tpu.FLASH(series_dir)
    out = m.reynolds_series(file_type="plt")
    assert out["Rxx"].shape[0] == 4

    m.load(file_index=1, file_type="plt")
    _, stress, means = m.reynolds_stress(raxis=0)
    np.testing.assert_allclose(out["Rxy"][1], stress["Rxy"], rtol=1e-11)
    np.testing.assert_allclose(out["mean_dens"][1], means["dens"], rtol=1e-12)


def test_summary_series_matches_per_file(tmp_path):
    import jax.numpy as jnp

    from fava_tpu.ops import velocity as vel_ops

    for i, t in enumerate([0.0, 0.1, 0.2], start=1):
        synthetic.make_uniform_file(
            tmp_path / f"rt_hdf5_uniform_{i:04d}",
            ncells=(8, 8, 8),
            fields=("dens", "velx", "vely", "velz", "pres", "gamc"),
            seed=i,
            time=t,
        )
    m = fava_tpu.FLASH(tmp_path)
    out = m.summary_series(file_type="uni")
    np.testing.assert_allclose(out["times"], [0.0, 0.1, 0.2])
    assert "mach_rms" in out and out["mach_rms"].shape == (3,)

    # Per-file loop on the model API must give identical rows.
    for row, idx in enumerate([0, 1, 2]):
        m.load(file_type="uni", file_index=idx)
        single = m.turbulence_summary()
        for k, v in single.items():
            np.testing.assert_allclose(out[k][row], v, rtol=1e-12, err_msg=k)


def test_summary_series_no_pres_and_ragged_guard(tmp_path):
    # Without pres: no Mach columns. A catalog where only SOME files
    # carry pres must raise instead of silently misaligning columns.
    synthetic.make_uniform_file(
        tmp_path / "rt_hdf5_uniform_0001", ncells=(8, 8, 8), seed=1, time=0.0
    )
    m = fava_tpu.FLASH(tmp_path)
    out = m.summary_series(file_type="uni")
    assert "mach_rms" not in out and "u_rms" in out

    synthetic.make_uniform_file(
        tmp_path / "rt_hdf5_uniform_0002",
        ncells=(8, 8, 8),
        fields=("dens", "velx", "vely", "velz", "pres", "gamc"),
        seed=2,
        time=0.1,
    )
    m2 = fava_tpu.FLASH(tmp_path)
    with pytest.raises(ValueError, match="inconsistent stat columns"):
        m2.summary_series(file_type="uni")


def test_gradient_series_matches_per_file(tmp_path):
    for i, t in enumerate([0.0, 0.1, 0.2], start=1):
        synthetic.make_uniform_file(
            tmp_path / f"rt_hdf5_uniform_{i:04d}", ncells=(8, 8, 8), seed=10 + i, time=t
        )
    m = fava_tpu.FLASH(tmp_path)
    out = m.gradient_series(file_type="uni")
    np.testing.assert_allclose(out["times"], [0.0, 0.1, 0.2])
    assert out["derivative_skewness"].shape == (3,)
    assert out["gradient_moment2"].shape == (3, 3, 3)

    for row, idx in enumerate([0, 1, 2]):
        m.load(file_type="uni", file_index=idx)
        single = m.velocity_gradient_statistics()
        for k, v in single.items():
            np.testing.assert_allclose(out[k][row], v, rtol=1e-12, err_msg=k)


def test_series_unknown_file_type_named_error(tmp_path):
    """An unknown file_type gets a named ValueError, not a bare KeyError
    from the catalog dict literal."""
    synthetic.make_uniform_file(tmp_path / "rt_hdf5_uniform_0001", ncells=(8, 8, 8))
    m = fava_tpu.FLASH(tmp_path)
    with pytest.raises(ValueError, match="mesh-series.*'plt'"):
        m.summary_series(file_type="prt")


def test_packed_stat_series_permuted_column_message(tmp_path):
    """Same columns in a different order must be reported as such — the
    symmetric set difference is empty there and used to print a
    misleading 'got [] only sometimes'."""
    import jax.numpy as jnp

    from fava_tpu.analysis.time_series import _packed_stat_series

    for i in (1, 2):
        synthetic.make_uniform_file(
            tmp_path / f"rt_hdf5_uniform_{i:04d}", ncells=(8, 8, 8), seed=i, time=0.1 * i
        )
    paths = sorted(tmp_path.glob("*uniform*"))
    calls = []

    def make_vec(snap):
        calls.append(snap.path)
        names = ("a", "b") if len(calls) == 1 else ("b", "a")
        return jnp.zeros(2), names

    with pytest.raises(ValueError, match="different order.*'b', 'a'"):
        _packed_stat_series(paths, ["dens"], make_vec, prefetch_depth=1)
