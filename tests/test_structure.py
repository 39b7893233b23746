"""Structure functions: shapes, determinism, and analytic field checks."""

import jax.numpy as jnp
import numpy as np
import pytest

from fava_tpu.ops.structure import structure_functions


def _domain():
    return np.array([[0.0, 1.0], [0.0, 1.0], [0.0, 1.0]])


def test_output_shapes_and_keys():
    rng = np.random.default_rng(0)
    vels = [jnp.asarray(rng.standard_normal((8, 8, 8))) for _ in range(3)]
    out = structure_functions(
        vels, domain_bounds=_domain(), num_seps=6, num_points=50, sep_bounds=(0.05, 0.4)
    )
    assert set(out.keys()) == {"transverse", "longitudinal", "separations"}
    assert out["separations"].shape == (6,)
    for o in range(1, 11):
        assert out["longitudinal"][f"{o}"].shape == (6,)
        assert out["transverse"][f"{o}"].shape == (6,)
        assert np.isfinite(out["longitudinal"][f"{o}"]).all()


def test_default_sep_bounds_resolvable_range():
    """Defaults must be callable (the reference's (0,1) default crashes
    its own geomspace) and span [min cell size, half narrowest width]."""
    rng = np.random.default_rng(3)
    vels = [jnp.asarray(rng.standard_normal((8, 8, 8))) for _ in range(3)]
    out = structure_functions(vels, domain_bounds=_domain(), num_seps=5, num_points=20)
    seps = out["separations"]
    np.testing.assert_allclose(seps[0], 1.0 / 8.0)
    np.testing.assert_allclose(seps[-1], 0.5)
    assert np.isfinite(out["longitudinal"]["2"]).all()


def test_log_scale_rejects_nonpositive_lower_bound():
    vels = [jnp.ones((4, 4, 4)) for _ in range(3)]
    with pytest.raises(ValueError, match="must be positive"):
        structure_functions(
            vels, domain_bounds=_domain(), num_seps=4, num_points=8, sep_bounds=(0.0, 1.0)
        )


def test_deterministic_given_seed():
    rng = np.random.default_rng(1)
    vels = [jnp.asarray(rng.standard_normal((8, 8, 8))) for _ in range(3)]
    a = structure_functions(vels, domain_bounds=_domain(), num_seps=4, num_points=32, sep_bounds=(0.1, 0.3), seed=5)
    b = structure_functions(vels, domain_bounds=_domain(), num_seps=4, num_points=32, sep_bounds=(0.1, 0.3), seed=5)
    c = structure_functions(vels, domain_bounds=_domain(), num_seps=4, num_points=32, sep_bounds=(0.1, 0.3), seed=6)
    np.testing.assert_array_equal(a["longitudinal"]["2"], b["longitudinal"]["2"])
    assert not np.array_equal(a["longitudinal"]["2"], c["longitudinal"]["2"])


def test_constant_field_gives_zero():
    vels = [jnp.ones((8, 8, 8)) for _ in range(3)]
    out = structure_functions(
        vels, domain_bounds=_domain(), num_seps=4, num_points=64, sep_bounds=(0.1, 0.4)
    )
    for o in range(1, 11):
        np.testing.assert_allclose(out["longitudinal"][f"{o}"], 0.0, atol=1e-12)
        np.testing.assert_allclose(out["transverse"][f"{o}"], 0.0, atol=1e-12)


def test_linear_shear_second_order_scaling():
    """For v = (S*y, 0, 0), the 2nd-order structure function grows ~ r^2
    (ignoring periodic wrap) — check monotonic growth at small r."""
    n = 32
    y = (np.arange(n) + 0.5) / n
    vx = np.broadcast_to(y[None, :, None], (n, n, n)).copy()
    vels = [jnp.asarray(vx), jnp.zeros((n, n, n)), jnp.zeros((n, n, n))]
    out = structure_functions(
        vels,
        domain_bounds=_domain(),
        num_seps=5,
        num_points=4000,
        sep_bounds=(0.05, 0.2),
        log_scale=False,
        seed=0,
    )
    s2 = out["longitudinal"]["2"] + out["transverse"]["2"]
    assert (np.diff(s2) > 0).all()


def test_anisotropic_mode_accepts_reference_spelling(uniform_file):
    from fava_tpu.mesh import FlashUniform

    mesh = FlashUniform(uniform_file)
    mesh.load()
    out = mesh.structure_functions(num_seps=3, num_points=16, sep_bounds=(0.1, 0.3), anistropic=True)
    assert "separations" in out


def test_shared_sample_mode_order1_matches_resample_mode():
    """resample_per_order=False uses the SAME draw as order 1 of the
    default mode (streams 0-2), so order 1 is bit-identical; higher
    orders remain consistent moments of that shared draw."""
    rng = np.random.default_rng(2)
    vels = [jnp.asarray(rng.standard_normal((8, 8, 8))) for _ in range(3)]
    kw = dict(
        domain_bounds=_domain(), num_seps=4, num_points=256, sep_bounds=(0.1, 0.4), seed=9
    )
    ref = structure_functions(vels, resample_per_order=True, **kw)
    fast = structure_functions(vels, resample_per_order=False, **kw)
    np.testing.assert_array_equal(ref["longitudinal"]["1"], fast["longitudinal"]["1"])
    np.testing.assert_array_equal(ref["transverse"]["1"], fast["transverse"]["1"])
    # Power-mean inequality on the shared draw: (S_p)^(1/p) nondecreasing in p.
    for comp in ("longitudinal", "transverse"):
        root_means = [fast[comp][f"{o}"] ** (1.0 / o) for o in range(1, 11)]
        for a, b in zip(root_means[:-1], root_means[1:]):
            assert (b >= a - 1e-12).all()


def test_shared_sample_mode_constant_field_gives_zero():
    vels = [jnp.ones((8, 8, 8)) for _ in range(3)]
    out = structure_functions(
        vels,
        domain_bounds=_domain(),
        num_seps=4,
        num_points=64,
        sep_bounds=(0.1, 0.4),
        resample_per_order=False,
    )
    for o in range(1, 11):
        np.testing.assert_allclose(out["longitudinal"][f"{o}"], 0.0, atol=1e-12)
        np.testing.assert_allclose(out["transverse"][f"{o}"], 0.0, atol=1e-12)


def test_mesh_wrapper_rejects_unknown_kwargs(uniform_file):
    from fava_tpu.mesh import FlashUniform

    mesh = FlashUniform(uniform_file)
    mesh.load()
    with pytest.raises(TypeError, match="unexpected keyword"):
        mesh.structure_functions(num_seps=3, num_points=16, sep_bounds=(0.1, 0.3), nonsense=1)


def test_structure_functions_seed_keeps_all_64_bits():
    """seed=2^32+k must NOT collapse to seed=k (the jitted path passes
    the full (hi, lo) Threefry key through uint32 scalar args)."""
    rng = np.random.default_rng(5)
    vels = [jnp.asarray(rng.standard_normal((8, 8, 8))) for _ in range(3)]
    domain = np.array([[0.0, 1.0]] * 3)
    kw = dict(domain_bounds=domain, num_seps=4, num_points=64, sep_bounds=[0.1, 0.4])
    a = structure_functions(vels, seed=7, **kw)
    b = structure_functions(vels, seed=(1 << 32) + 7, **kw)
    assert not np.allclose(a["longitudinal"]["2"], b["longitudinal"]["2"])
