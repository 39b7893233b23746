"""Velocity-gradient statistics vs the NumPy oracle (ops/gradients.py).

The device path packs central moments from two fused passes and closes
enstrophy/dilatation through covariances; the oracle materializes the
fluctuation gradient fields and reduces them directly — agreement
checks both the packing layout and the covariance identities.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import fava_tpu
from fava_tpu.ops import gradients as grad_ops
from tests.oracles.gradients import gradient_stats_oracle


def _fields(shape, seed=0, nd=3):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal(shape) for _ in range(nd)]


def _compare(out, ref):
    assert set(out) == set(ref)
    for k, v in ref.items():
        np.testing.assert_allclose(out[k], v, rtol=1e-10, atol=1e-12, err_msg=k)


@pytest.mark.parametrize("shape", [(16, 16, 16), (16, 12, 8)])
@pytest.mark.parametrize("boundary", ["periodic", "interior"])
def test_matches_oracle_3d(shape, boundary):
    vels = _fields(shape, 3)
    out = grad_ops.velocity_gradient_statistics(
        *[jnp.asarray(v) for v in vels], boundary=boundary
    )
    _compare(out, gradient_stats_oracle(vels, boundary=boundary))


def test_matches_oracle_with_lengths_2d():
    shape = (16, 12)
    vels = _fields(shape, 4, nd=2)
    lengths = (2.5, 0.75)
    out = grad_ops.velocity_gradient_statistics(
        *[jnp.asarray(v) for v in vels], lengths=lengths
    )
    _compare(out, gradient_stats_oracle(vels, lengths=lengths))


def test_single_mode_closed_form():
    # u_x = sin(k y): the only gradient is g_01 = cos(k y) sin(k dy)/dy
    # (the FD transfer factor). Skewness 0, flatness 3/2 (cosine),
    # enstrophy = c2[0,1] (omega_z = -g_01), zero dilatation.
    n, m, L = 32, 3, 2.0
    y = (np.arange(n) + 0.0) * (L / n)
    k = 2.0 * np.pi * m / L
    ux = np.broadcast_to(np.sin(k * y)[None, :, None], (n, n, n)).copy()
    zeros = np.zeros((n, n, n))
    out = grad_ops.velocity_gradient_statistics(
        jnp.asarray(ux), jnp.asarray(zeros), jnp.asarray(zeros), lengths=(L, L, L)
    )
    dy = L / n
    amp = np.sin(k * dy) / dy
    assert abs(out["gradient_moment2"][0, 1] - 0.5 * amp**2) < 1e-10
    assert abs(out["enstrophy"] - 0.5 * amp**2) < 1e-10
    assert abs(out["dilatation_msq"]) < 1e-12
    assert abs(out["pseudo_dissipation"] - 0.5 * amp**2) < 1e-10
    assert abs(out["transverse_flatness"] - 1.5 / 6.0) < 1e-10  # 1.5 on the
    # one active off-diagonal, 0 on the other five (constant gradients)
    # The LONGITUDINAL Taylor microscale uses diagonal gradients only;
    # this purely transverse mode has none (guarded ratio -> 0).
    assert out["taylor_microscale"][0] == 0.0


def test_mean_shear_lands_in_gradient_mean():
    # u_x = s*y + noise: the uniform shear must appear in
    # gradient_mean[0,1] and stay OUT of the fluctuation moments
    # (device two-pass centering; host-side m2 - m1^2 would cancel).
    n, L, s = 16, 1.0, 50.0
    rng = np.random.default_rng(7)
    y = (np.arange(n) + 0.5) * (L / n)
    noise = 1e-2 * rng.standard_normal((n, n, n))
    ux = np.broadcast_to(y[None, :, None], (n, n, n)) * s + noise
    vels = [ux, rng.standard_normal((n, n, n)), rng.standard_normal((n, n, n))]
    # interior only: the periodic wrap sees the sawtooth jump of s*y
    out = grad_ops.velocity_gradient_statistics(
        *[jnp.asarray(v) for v in vels], lengths=(L, L, L), boundary="interior"
    )
    ref = gradient_stats_oracle(vels, lengths=(L, L, L), boundary="interior")
    _compare(out, ref)
    # the noise FD mean is ~2e-3 over the interior; shear dominates
    np.testing.assert_allclose(out["gradient_mean"][0, 1], s, rtol=1e-3)
    # fluctuation gradient variance is noise-sized, not shear-sized
    assert out["gradient_moment2"][0, 1] < 1.0


def test_validation_errors():
    n = 8
    v = jnp.zeros((n, n, n))
    with pytest.raises(ValueError, match="boundary"):
        grad_ops.velocity_gradient_statistics(v, v, v, boundary="wrap")
    with pytest.raises(ValueError, match="velocity components"):
        grad_ops.velocity_gradient_statistics(v, v)
    tiny = jnp.zeros((2, 2, 2))
    with pytest.raises(ValueError, match="at least 3 cells"):
        grad_ops.velocity_gradient_statistics(tiny, tiny, tiny, boundary="interior")


def test_registered_analysis_from_arrays():
    rng = np.random.default_rng(11)
    n = 12
    arrays = {
        "dens": 1.0 + 0.4 * rng.random((n, n, n)),
        "velx": rng.standard_normal((n, n, n)),
        "vely": rng.standard_normal((n, n, n)),
        "velz": rng.standard_normal((n, n, n)),
    }
    bounds = [[0.0, 2.0], [0.0, 1.0], [0.0, 1.0]]
    m = fava_tpu.from_arrays(arrays, domain_bounds=bounds)
    out = m.velocity_gradient_statistics()
    ref = gradient_stats_oracle(
        [arrays["velx"], arrays["vely"], arrays["velz"]], lengths=(2.0, 1.0, 1.0)
    )
    _compare(out, ref)


def test_amr_model_gets_routed_error(tmp_path):
    from fava_tpu.io import synthetic

    synthetic.make_amr_file(tmp_path / "rt_hdf5_plt_cnt_0000")
    model = fava_tpu.FLASH(tmp_path)
    model.load(file_type="plt")
    with pytest.raises(AttributeError, match="uniform-grid"):
        model.velocity_gradient_statistics()


def test_gradient_stats_sharded_inputs_match_unsharded(uniform_file_32, eight_device_mesh):
    """Under an active device mesh the uniform volumes arrive
    slab-sharded; the gradient rolls become GSPMD halo exchanges and
    must not change the numbers."""
    from fava_tpu.mesh import FlashUniform
    from fava_tpu.parallel import use_mesh

    mesh0 = FlashUniform(uniform_file_32)
    mesh0.load()
    ref = mesh0.velocity_gradient_statistics()

    with use_mesh(eight_device_mesh):
        mesh1 = FlashUniform(uniform_file_32)
        mesh1.load()
        assert len(mesh1.data("velx").sharding.device_set) == 8
        got = mesh1.velocity_gradient_statistics()

    for k, r in ref.items():
        np.testing.assert_allclose(got[k], r, rtol=1e-9, atol=1e-12, err_msg=k)


def _qr_oracle(vels, lengths=None, boundary="periodic"):
    """f64 NumPy invariants + Q_w with the same FD/normalization."""
    nd = 3
    shape = vels[0].shape
    dx = (
        [2.0 * np.pi / n for n in shape]
        if lengths is None
        else [float(L) / n for L, n in zip(lengths, shape)]
    )
    inner = tuple(slice(1, -1) for _ in range(nd))

    def grad(i, j):
        d = (np.roll(vels[i], -1, axis=j) - np.roll(vels[i], 1, axis=j)) / (2.0 * dx[j])
        return d[inner] if boundary == "interior" else d

    g = [[grad(i, j) for j in range(3)] for i in range(3)]
    P = -(g[0][0] + g[1][1] + g[2][2])
    trA2 = sum(g[i][j] * g[j][i] for i in range(3) for j in range(3))
    Q = 0.5 * (P * P - trA2)
    det = (
        g[0][0] * (g[1][1] * g[2][2] - g[1][2] * g[2][1])
        - g[0][1] * (g[1][0] * g[2][2] - g[1][2] * g[2][0])
        + g[0][2] * (g[1][0] * g[2][1] - g[1][1] * g[2][0])
    )
    R = -det
    w2 = (g[2][1] - g[1][2]) ** 2 + (g[0][2] - g[2][0]) ** 2 + (g[1][0] - g[0][1]) ** 2
    return Q, R, w2.mean() / 4.0


def test_invariant_pdfs_match_histogram2d_oracle():
    vels = _fields((12, 12, 12), 21)
    out = grad_ops.gradient_invariant_pdfs(
        *[jnp.asarray(v) for v in vels], nbins=(24, 20), qr_range=6.0
    )
    Q, R, qw = _qr_oracle(vels)
    np.testing.assert_allclose(out["q_w"], qw, rtol=1e-12)
    counts, _, _ = np.histogram2d(
        Q.ravel(),
        R.ravel(),
        bins=(24, 20),
        range=[(-6.0 * qw, 6.0 * qw), (-6.0 * qw**1.5, 6.0 * qw**1.5)],
    )
    np.testing.assert_allclose(out["counts"], counts)
    # pdf integrates to the inside fraction over the normalized axes
    areas = np.diff(out["q_edges"])[:, None] * np.diff(out["r_edges"])[None, :]
    np.testing.assert_allclose(
        (out["pdf"] * areas).sum(), out["inside_fraction"], rtol=1e-12
    )
    np.testing.assert_allclose(out["inside_fraction"], counts.sum() / Q.size, rtol=1e-12)


def test_invariant_pdfs_solid_body_rotation():
    # u = Omega x r: A is constant antisymmetric, so every cell sits at
    # (Q, R) = (Omega^2, 0) and Q_w = Omega^2 -> normalized (1, 0).
    n, L, Om = 12, 1.0, 0.7
    x = ((np.arange(n) + 0.5) * (L / n))
    X, Y = np.meshgrid(x, x, indexing="ij")
    ux = np.broadcast_to((-Om * Y)[:, :, None], (n, n, n)).copy()
    uy = np.broadcast_to((Om * X)[:, :, None], (n, n, n)).copy()
    uz = np.zeros((n, n, n))
    out = grad_ops.gradient_invariant_pdfs(
        jnp.asarray(ux), jnp.asarray(uy), jnp.asarray(uz),
        lengths=(L, L, L), nbins=(16, 16), qr_range=2.0, boundary="interior",
    )
    ncells = (n - 2) ** 3
    assert out["inside_fraction"] == 1.0
    np.testing.assert_allclose(out["q_w"], Om**2, rtol=1e-12)
    # all counts in the bin containing normalized (Q, R) = (1, 0)
    qi = np.searchsorted(out["q_edges"], 1.0) - 1
    nz = np.nonzero(out["counts"])
    assert set(nz[0].tolist()) == {qi}
    assert out["counts"].sum() == ncells


def test_invariant_pdfs_validation():
    v = jnp.zeros((8, 8))
    with pytest.raises(ValueError):
        grad_ops.gradient_invariant_pdfs(v, v, v)  # 2D volumes
