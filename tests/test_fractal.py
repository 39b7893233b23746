"""Fractal dimension vs the literal-loop oracle + analytic sanity cases."""

import numpy as np
import pytest

from fava_tpu.ops.fractal import edge_detect, fractal_dimension
from tests.oracles.fractal import edge_detect_oracle, fractal_dimension_oracle

import jax.numpy as jnp


def _smooth_volume(n=16, seed=2):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    return 1.0 / (1.0 + np.exp((X - 0.5) * 15)) + 0.05 * rng.standard_normal((n, n, n))


def test_edge_detect_matches_oracle():
    data = _smooth_volume()
    got = np.asarray(edge_detect(jnp.asarray(data), jnp.asarray(0.5)))
    ref = edge_detect_oracle(data, 0.5)
    np.testing.assert_array_equal(got, ref)


def test_fractal_dimension_matches_oracle():
    data = _smooth_volume()
    got = fractal_dimension(data, 0.5)["0.5"]
    ref = fractal_dimension_oracle(data, 0.5)
    for key in ref:
        np.testing.assert_allclose(got[key], ref[key], rtol=1e-12, err_msg=key)


def test_flat_interface_dimension_is_two():
    # A planar contour surface has box-counting dimension ~2.
    n = 32
    x = np.linspace(0, 1, n)
    X = np.meshgrid(x, x, x, indexing="ij")[0]
    data = 1.0 - X  # decreasing in x, crosses 0.5 on a plane
    got = fractal_dimension(data, 0.5)["0.5"]
    assert abs(got["average fractal dimension"] - 2.0) < 0.2
    assert got["R2"] > 0.99


def test_contour_list_and_validation():
    data = _smooth_volume(8)
    out = fractal_dimension(data, [0.4, 0.6])
    assert set(out.keys()) == {"0.4", "0.6"}
    with pytest.raises(ValueError):
        fractal_dimension(data, "bad")
    with pytest.raises(ValueError):
        fractal_dimension(data, True)  # bool is not a contour level
    # numpy scalars are scalars too (np.integer/np.floating).
    out_np = fractal_dimension(data, np.float64(0.5))
    out_int = fractal_dimension(data, np.int64(1))
    assert set(out_np.keys()) == {"0.5"} and set(out_int.keys()) == {"1"}


def test_empty_contour_is_nan_like_the_oracle():
    """A contour above every cell leaves zero filled boxes at every
    level; the reference's stats pipeline (log2(0) -> -inf -> inf-inf)
    then yields NaN across the board (FlashUniform.py:211-223). Pin
    that the rebuild degrades identically — defined NaNs, no raise —
    instead of, e.g., dropping empty levels and reporting a number."""
    data = _smooth_volume(8)
    with np.errstate(invalid="ignore", divide="ignore"):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            got = fractal_dimension(data, 99.0)["99.0"]
            ref = fractal_dimension_oracle(data, 99.0)
    for key in ref:
        assert np.isnan(ref[key]), key  # oracle itself degenerates to NaN
        assert np.isnan(got[key]), key


def test_contours_none_uses_volume_mean():
    """contours=None (the obvious spelling) must resolve to the volume
    mean in-trace and match an explicit contour at that value."""
    data = _smooth_volume(8)
    got = fractal_dimension(data, None)
    mean = float(np.mean(data))
    ref = fractal_dimension(data, mean)
    key_none = next(iter(got))
    key_ref = next(iter(ref))
    for field in ("average fractal dimension", "slope", "R2"):
        assert got[key_none][field] == pytest.approx(ref[key_ref][field], rel=1e-12)
