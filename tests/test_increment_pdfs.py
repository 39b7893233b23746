"""Velocity-increment PDFs: shapes, closed forms, same-draw oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from fava_tpu.ops.structure import _INC_STREAM, velocity_increment_pdfs
from fava_tpu.utils import prng


def _domain():
    return np.array([[0.0, 1.0], [0.0, 1.0], [0.0, 1.0]])


def test_output_shapes_and_keys():
    rng = np.random.default_rng(0)
    vels = [jnp.asarray(rng.standard_normal((8, 8, 8))) for _ in range(3)]
    out = velocity_increment_pdfs(
        vels,
        domain_bounds=_domain(),
        num_seps=4,
        num_points=256,
        sep_bounds=(0.05, 0.4),
        nbins=21,
    )
    assert set(out.keys()) == {"separations", "edges", "longitudinal", "transverse"}
    assert out["separations"].shape == (4,)
    assert out["edges"].shape == (22,)
    np.testing.assert_allclose(out["edges"][0], -10.0)
    np.testing.assert_allclose(out["edges"][-1], 10.0)
    for comp in ("longitudinal", "transverse"):
        assert out[comp]["counts"].shape == (4, 21)
        # normalized samples can fall outside +-nsigma, never above N
        assert (out[comp]["counts"].sum(axis=1) <= 256).all()
        assert (out[comp]["counts"].sum(axis=1) > 0).all()
        for k in ("mean", "std", "skewness", "flatness"):
            assert out[comp][k].shape == (4,)
    # a random field is not degenerate
    assert np.isfinite(out["longitudinal"]["flatness"]).all()


def test_deterministic_given_seed_and_seed_sensitivity():
    rng = np.random.default_rng(1)
    vels = [jnp.asarray(rng.standard_normal((8, 8, 8))) for _ in range(3)]
    kw = dict(
        domain_bounds=_domain(), num_seps=3, num_points=128, sep_bounds=(0.1, 0.3)
    )
    a = velocity_increment_pdfs(vels, seed=5, **kw)
    b = velocity_increment_pdfs(vels, seed=5, **kw)
    c = velocity_increment_pdfs(vels, seed=6, **kw)
    np.testing.assert_array_equal(a["longitudinal"]["counts"], b["longitudinal"]["counts"])
    assert not np.array_equal(a["longitudinal"]["counts"], c["longitudinal"]["counts"])


def test_constant_field_center_bin_and_nan_stats():
    vels = [jnp.full((8, 8, 8), 2.5) for _ in range(3)]
    out = velocity_increment_pdfs(
        vels,
        domain_bounds=_domain(),
        num_seps=3,
        num_points=200,
        sep_bounds=(0.1, 0.4),
        nbins=11,
    )
    for comp in ("longitudinal", "transverse"):
        counts = out[comp]["counts"]
        # all increments are exactly zero -> z = 0 -> the center bin
        np.testing.assert_array_equal(counts[:, 5], 200)
        np.testing.assert_array_equal(counts.sum(axis=1), 200)
        np.testing.assert_array_equal(out[comp]["std"], 0.0)
        np.testing.assert_array_equal(out[comp]["mean"], 0.0)
        assert np.isnan(out[comp]["skewness"]).all()
        assert np.isnan(out[comp]["flatness"]).all()


def test_anisotropic_shear_longitudinal_degenerate_transverse_live():
    """v = (0, S*x, 0) with anisotropic=True (rhat = x-hat): the
    longitudinal projection samples only v_x = 0, so it is EXACTLY
    degenerate (center-bin counts, NaN stats), while the transverse
    direction (that = cross(z-hat, x-hat) = y-hat) sees the shear."""
    n = 16
    x = (np.arange(n) + 0.5) / n
    vy = np.broadcast_to(x[:, None, None], (n, n, n)).copy()
    vels = [jnp.zeros((n, n, n)), jnp.asarray(vy), jnp.zeros((n, n, n))]
    out = velocity_increment_pdfs(
        vels,
        domain_bounds=_domain(),
        num_seps=3,
        num_points=512,
        sep_bounds=(0.1, 0.3),
        nbins=11,
        anisotropic=True,
    )
    long = out["longitudinal"]
    np.testing.assert_array_equal(long["counts"][:, 5], 512)
    np.testing.assert_array_equal(long["std"], 0.0)
    assert np.isnan(long["flatness"]).all()
    trans = out["transverse"]
    assert (trans["std"] > 0).all()
    assert np.isfinite(trans["flatness"]).all()
    # shear increments are symmetric about 0 up to sampling noise
    assert np.abs(trans["skewness"]).max() < 1.0


def _oracle(vels_np, separations, domain, num_seps, num_points, nbins, nsigma, seed):
    """Same-draw NumPy reimplementation (f64): identical Threefry draws
    (streams _INC_STREAM..+2), geometry, gathers, projections, and
    np.histogram binning of the normalized increments."""
    ndim = 3
    lo = domain[:, 0]
    width = domain[:, 1] - domain[:, 0]
    shape = np.asarray(vels_np[0].shape)
    cell = width / shape
    sshape = (num_seps, num_points)

    u_pos = np.asarray(prng.uniform(seed, _INC_STREAM, sshape + (ndim,), jnp.float64))
    u_phi = np.asarray(prng.uniform(seed, _INC_STREAM + 1, sshape, jnp.float64))
    u_the = np.asarray(prng.uniform(seed, _INC_STREAM + 2, sshape, jnp.float64))

    p1 = lo + u_pos * width
    phi = 2.0 * np.pi * u_phi
    theta = np.arccos(2.0 * u_the - 1.0)
    direction = np.stack(
        [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)],
        axis=-1,
    )
    p2 = p1 + separations[:, None, None] * direction
    p2 = lo + np.mod(p2 - lo, width)

    def cell_index(p):
        return np.clip(np.floor((p - lo) / cell).astype(np.int64), 0, shape - 1)

    i1, i2 = cell_index(p1), cell_index(p2)

    def sample(vol, idx):
        return vol[idx[..., 0], idx[..., 1], idx[..., 2]]

    dv = np.stack([sample(v, i2) - sample(v, i1) for v in vels_np], axis=-1)
    # pre-wrap draw direction (minimal image), NOT the wrapped p2 - p1
    rhat = direction / np.sqrt(np.sum(direction**2, axis=-1, keepdims=True))
    dl = np.sum(dv * rhat, axis=-1)
    polar = np.abs(rhat[..., 2:3]) > 0.9
    a = np.where(polar, np.array([1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0]))
    that = np.cross(a, rhat)
    that = that / np.sqrt(np.sum(that**2, axis=-1, keepdims=True))
    dt = np.sum(dv * that, axis=-1)

    edges = np.linspace(-nsigma, nsigma, nbins + 1)
    out = {}
    for name, x in (("longitudinal", dl), ("transverse", dt)):
        mean = x.mean(axis=1)
        c = x - mean[:, None]
        m2 = (c * c).mean(axis=1)
        std = np.sqrt(m2)
        z = c / std[:, None]
        counts = np.stack([np.histogram(z[s], bins=edges)[0] for s in range(num_seps)])
        out[name] = {
            "counts": counts,
            "mean": mean,
            "std": std,
            "skewness": (c**3).mean(axis=1) / m2**1.5,
            "flatness": (c**4).mean(axis=1) / m2**2,
        }
    return out


def test_same_draw_numpy_oracle():
    rng = np.random.default_rng(7)
    vels_np = [rng.standard_normal((12, 12, 12)) for _ in range(3)]
    domain = _domain()
    num_seps, num_points, nbins, nsigma = 4, 300, 15, 6.0
    out = velocity_increment_pdfs(
        [jnp.asarray(v) for v in vels_np],
        domain_bounds=domain,
        num_seps=num_seps,
        num_points=num_points,
        sep_bounds=(0.08, 0.35),
        nbins=nbins,
        nsigma=nsigma,
        seed=11,
    )
    ora = _oracle(
        vels_np, out["separations"], domain, num_seps, num_points, nbins, nsigma, 11
    )
    for comp in ("longitudinal", "transverse"):
        # reduction-order ulps can flip a sample across a bin edge;
        # allow at most one such flip across the whole table
        diff = np.abs(out[comp]["counts"] - ora[comp]["counts"]).sum()
        assert diff <= 2, f"{comp} count mismatch {diff}"
        for k in ("mean", "std", "skewness", "flatness"):
            np.testing.assert_allclose(out[comp][k], ora[comp][k], rtol=1e-10, atol=1e-13)


def test_prewrap_rhat_is_minimal_image():
    """The increment-PDF decomposition direction must be the minimal-
    image separation: sep * dirhat equals (p2 - p1) wrapped into
    [-width/2, width/2) per component, while the structure-function
    (wrapped p2 - p1) rhat disagrees for every pair whose endpoint
    wrapped. Regression for the post-wrap decomposition bug."""
    from fava_tpu.ops.structure import _draw_increments

    rng = np.random.default_rng(3)
    vols = tuple(jnp.asarray(rng.standard_normal((8, 8, 8))) for _ in range(3))
    width = np.array([1.0, 1.0, 1.0])
    seps = jnp.asarray(np.array([0.35, 0.49]))  # near width/2: many wraps
    dv, rhat, dirhat = _draw_increments(
        vols,
        seps,
        jnp.zeros(3, dtype=jnp.float64),
        jnp.asarray(width),
        jnp.asarray(width / 8),
        prng._key(0),
        _INC_STREAM,
        num_seps=2,
        num_points=512,
        ndim=3,
        vol_shape=(8, 8, 8),
        anisotropic=False,
    )
    dirhat = np.asarray(dirhat)
    np.testing.assert_allclose(np.sum(dirhat**2, axis=-1), 1.0, atol=1e-12)
    # reconstruct the endpoints exactly as _draw_increments draws them
    u_pos = np.asarray(prng.uniform((0, 0), _INC_STREAM, (2, 512, 3), jnp.float64))
    p1 = u_pos * width
    disp = np.asarray(seps)[:, None, None] * dirhat
    p2 = np.mod(p1 + disp, width)
    miv = np.mod(p2 - p1 + width / 2, width) - width / 2
    np.testing.assert_allclose(miv, disp, atol=1e-12)
    # the wrapped-vector rhat is NOT minimal image once an endpoint wraps
    wrapped = np.any(np.abs(p2 - p1 - disp) > 1e-9, axis=-1)
    assert wrapped.any()
    mismatch = np.abs(np.asarray(rhat) - dirhat).max(axis=-1) > 1e-6
    np.testing.assert_array_equal(mismatch, wrapped)


def test_argument_validation():
    vels = [jnp.ones((4, 4, 4)) for _ in range(3)]
    with pytest.raises(ValueError, match="num_points"):
        velocity_increment_pdfs(vels, domain_bounds=_domain(), num_points=2**24)
    with pytest.raises(ValueError, match="nbins"):
        velocity_increment_pdfs(vels, domain_bounds=_domain(), nbins=0)
    with pytest.raises(ValueError, match="nsigma"):
        velocity_increment_pdfs(vels, domain_bounds=_domain(), nsigma=0.0)
    with pytest.raises(ValueError, match="must be positive"):
        velocity_increment_pdfs(
            vels, domain_bounds=_domain(), sep_bounds=(0.0, 0.5), log_scale=True
        )


def test_mesh_wrapper_and_registered_analysis(uniform_file):
    from fava_tpu.mesh import FlashUniform
    from fava_tpu.models.model import Model

    mesh = FlashUniform(uniform_file)
    mesh.load()
    out = mesh.velocity_increment_pdfs(
        num_seps=3, num_points=64, sep_bounds=(0.1, 0.3), nbins=9
    )
    assert out["longitudinal"]["counts"].shape == (3, 9)
    # registration attaches the analysis as a Model method
    assert callable(getattr(Model, "velocity_increment_pdfs"))


def test_2d_volume_transverse_is_inplane_perp():
    """2D branch: rhat is the pre-wrap draw direction and
    that = perp(rhat) in-plane. Same-draw NumPy oracle reproduces the
    device moments exactly; the rigid-rotation closed form (dv exactly
    perpendicular to the cell-center separation) is asserted on the
    UNWRAPPED pairs the oracle can identify — a rigid rotation is not a
    periodic field, so wrapped pairs carry the wrap's geometry, which
    is the field's fault, not the decomposition's."""
    n, Om = 24, 0.5
    x = (np.arange(n) + 0.5) / n
    X, Y = np.meshgrid(x, x, indexing="ij")
    ux, uy = -Om * Y, Om * X
    num_seps, num_points = 3, 256
    out = velocity_increment_pdfs(
        [jnp.asarray(ux), jnp.asarray(uy)],
        domain_bounds=np.array([[0.0, 1.0], [0.0, 1.0]]),
        num_seps=num_seps,
        num_points=num_points,
        sep_bounds=(0.1, 0.2),
        nbins=11,
    )
    # --- same-draw oracle for the 2D branch ---
    seps = out["separations"]
    sshape = (num_seps, num_points)
    u_pos = np.asarray(prng.uniform(0, _INC_STREAM, sshape + (2,), jnp.float64))
    u_phi = np.asarray(prng.uniform(0, _INC_STREAM + 1, sshape, jnp.float64))
    u_the = np.asarray(prng.uniform(0, _INC_STREAM + 2, sshape, jnp.float64))
    phi = 2.0 * np.pi * u_phi
    theta = np.arccos(2.0 * u_the - 1.0)
    direction = np.stack(
        [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi)], axis=-1
    )
    p1 = u_pos
    p2 = np.mod(p1 + seps[:, None, None] * direction, 1.0)
    i1 = np.clip(np.floor(p1 * n).astype(int), 0, n - 1)
    i2 = np.clip(np.floor(p2 * n).astype(int), 0, n - 1)
    dv = np.stack(
        [v[i2[..., 0], i2[..., 1]] - v[i1[..., 0], i1[..., 1]] for v in (ux, uy)],
        axis=-1,
    )
    norm = np.sqrt(np.sum(direction**2, axis=-1, keepdims=True))
    rhat = direction / np.where(norm > 0, norm, 1.0)
    that = np.stack([-rhat[..., 1], rhat[..., 0]], axis=-1)
    dl = np.sum(dv * rhat, axis=-1)
    dt = np.sum(dv * that, axis=-1)
    np.testing.assert_allclose(out["longitudinal"]["mean"], dl.mean(axis=1), atol=1e-12)
    np.testing.assert_allclose(out["transverse"]["mean"], dt.mean(axis=1), atol=1e-12)
    np.testing.assert_allclose(out["longitudinal"]["std"], dl.std(axis=1), atol=1e-12)
    np.testing.assert_allclose(out["transverse"]["std"], dt.std(axis=1), atol=1e-12)
    # --- closed form on unwrapped pairs: dv = Om * perp(r2c - r1c) with
    # r2c - r1c within one cell of sep * rhat, so |dv . rhat| is bounded
    # by the one-cell quantization while |dv . that| ~ Om * sep ---
    unwrapped = np.all(np.abs(p2 - p1 - seps[:, None, None] * direction) < 1e-9, axis=-1)
    assert unwrapped.mean() > 0.5
    quant = Om * (2.0 / n)  # one cell of center quantization per endpoint
    assert np.abs(dl[unwrapped]).max() <= quant + 1e-12
    assert np.abs(dt[unwrapped]).std() > 3 * np.abs(dl[unwrapped]).std()
