"""Lagrangian dispersion statistics (beyond reference).

Oracle: hand-constructed particle series with analytically known
motion (uniform translation and per-particle ballistic motion), with
tables permuted differently per snapshot so tag tracking is load
bearing.
"""

import numpy as np
import pytest

import fava_tpu
from fava_tpu.io import flash_file


def _write_series(tmp_path, times, positions_of_t, nglob, velocities=None):
    """positions_of_t(t) -> (nglob, 3) array in tag order (tag = 1..nglob)."""
    rng = np.random.default_rng(7)
    tags = np.arange(1, nglob + 1, dtype=np.float64)
    for i, t in enumerate(times, start=1):
        perm = rng.permutation(nglob)
        pos = positions_of_t(t)
        table = {
            "tag": tags[perm],
            "posx": pos[perm, 0],
            "posy": pos[perm, 1],
            "posz": pos[perm, 2],
        }
        flash_file.write_particle_file(
            tmp_path / f"rt_hdf5_part_{i:04d}",
            int_scalars={"dimensionality": 3, "globalnumparticles": nglob},
            real_scalars={"time": float(t), "dt": 1e-3, "dtold": 1e-3},
            particles=table,
        )


def test_uniform_translation(tmp_path):
    """x(t) = x0 + v t with one shared v: single MSD = |v|^2 t^2 exactly,
    pair separations (hence pair MSD) are time-invariant."""
    nglob = 40
    times = [0.0, 0.25, 0.5]
    rng = np.random.default_rng(3)
    x0 = rng.uniform(0.0, 1.0, (nglob, 3))
    v = np.array([0.3, -0.2, 0.1])
    _write_series(tmp_path, times, lambda t: x0 + v * t, nglob)

    m = fava_tpu.FLASH(tmp_path)
    out = m.dispersion_statistics(npairs=16, seed=0)
    np.testing.assert_allclose(out["time"], times)
    np.testing.assert_allclose(
        out["single_msd"], (v**2).sum() * np.asarray(times) ** 2, rtol=1e-12, atol=1e-15
    )
    # Rigid translation: every pair separation is frozen.
    np.testing.assert_allclose(
        out["pair_msd"], out["initial_pair_separation_sq"], rtol=1e-12
    )
    assert out["npairs"] == 16
    assert out["pair_msd"][0] == pytest.approx(out["initial_pair_separation_sq"])


def test_ballistic_per_particle(tmp_path):
    """x_i(t) = x0_i + v_i t: single MSD = mean|v_i|^2 t^2; pair MSD over
    ALL anchors (npairs >= n) computable from the same construction."""
    nglob = 24
    times = [0.0, 0.5, 1.0]
    rng = np.random.default_rng(11)
    x0 = rng.uniform(0.0, 1.0, (nglob, 3))
    vel = rng.standard_normal((nglob, 3)) * 0.05
    _write_series(tmp_path, times, lambda t: x0 + vel * t, nglob)

    m = fava_tpu.FLASH(tmp_path)
    out = m.dispersion_statistics(npairs=10_000, seed=1)  # clamps to nglob
    assert out["npairs"] == nglob
    np.testing.assert_allclose(
        out["single_msd"],
        (vel**2).sum(axis=1).mean() * np.asarray(times) ** 2,
        rtol=1e-12,
        atol=1e-15,
    )
    # Oracle pair MSD: nearest neighbor at t=0 in tag order.
    d2 = ((x0[:, None, :] - x0[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    partner = d2.argmin(axis=1)
    # npairs == nglob: every particle is an anchor (order irrelevant for means).
    for j, t in enumerate(times):
        delta = (x0 + vel * t) - (x0[partner] + vel[partner] * t)
        np.testing.assert_allclose(
            out["pair_msd"][j], (delta**2).sum(axis=1).mean(), rtol=1e-12
        )
    np.testing.assert_allclose(
        out["initial_pair_separation_sq"], d2.min(axis=1).mean(), rtol=1e-12
    )


def test_requires_two_snapshots(tmp_path):
    _write_series(tmp_path, [0.0], lambda t: np.zeros((4, 3)), 4)
    m = fava_tpu.FLASH(tmp_path)
    with pytest.raises(ValueError, match="at least 2"):
        m.dispersion_statistics()


def test_missing_tag_hard_errors(tmp_path):
    """A tag present at t=0 but absent later must raise, not silently
    drop (positional pairing would corrupt the statistics)."""
    tags_a = np.array([1.0, 2.0, 3.0, 4.0])
    tags_b = np.array([1.0, 2.0, 3.0, 9.0])  # tag 4 vanished
    for i, (t, tags) in enumerate(zip([0.0, 0.1], [tags_a, tags_b]), start=1):
        flash_file.write_particle_file(
            tmp_path / f"rt_hdf5_part_{i:04d}",
            int_scalars={"dimensionality": 3, "globalnumparticles": 4},
            real_scalars={"time": t, "dt": 1e-3, "dtold": 1e-3},
            particles={
                "tag": tags,
                "posx": tags * 0.1,
                "posy": tags * 0.2,
                "posz": tags * 0.3,
            },
        )
    m = fava_tpu.FLASH(tmp_path)
    with pytest.raises(ValueError, match="not found"):
        m.dispersion_statistics(npairs=4)


def test_device_nn_matches_host_brute_force():
    """The device candidate search + exact f64 refinement must return
    the same partners as the f64 NumPy brute force (the f32 distance
    cancellation is confined to candidate SELECTION; the k finalists
    are re-decided in f64)."""
    from fava_tpu.analysis import dispersion as disp

    rng = np.random.default_rng(3)
    coords = rng.uniform(0.0, 1.0, size=(5000, 3))
    # include clustered points so top-k actually has near-ties to rank
    coords[100:200] = coords[0] + 1e-4 * rng.standard_normal((100, 3))
    anchors = rng.choice(coords.shape[0], size=300, replace=False)

    expected = disp._nn_host(coords, anchors)
    k = min(16, coords.shape[0] - 1)
    cand = disp._nn_device_candidates(coords, anchors, k)
    diff = coords[anchors][:, None, :] - coords[cand]
    d2 = (diff**2).sum(axis=-1)
    d2[cand == anchors[:, None]] = np.inf
    got = cand[np.arange(anchors.size), d2.argmin(axis=1)]
    np.testing.assert_array_equal(got, expected)


def test_nn_dispatcher_small_problem_stays_on_host(monkeypatch):
    """Below the dispatch-floor break-even the dispatcher must not pay
    a device round trip."""
    from fava_tpu.analysis import dispersion as disp

    def boom(*a, **k):  # pragma: no cover - called means failure
        raise AssertionError("device path used for a tiny problem")

    monkeypatch.setattr(disp, "_nn_device_candidates", boom)
    rng = np.random.default_rng(0)
    coords = rng.uniform(0.0, 1.0, size=(64, 3))
    anchors = np.arange(8)
    got = disp._nearest_neighbor_pairs(coords, anchors)
    np.testing.assert_array_equal(got, disp._nn_host(coords, anchors))
