"""Flame-window super-Gaussian fit."""

import numpy as np

from fava_tpu.ops.flame import XFACT, flame_window, super_gaussian


def test_recovers_known_centroid():
    # Build a synthetic transverse-stress profile that IS a super-Gaussian.
    radius = np.linspace(0.0, 2.0e6, 257)  # cm-scale like rtflame
    ccx = 0.5 * (radius[1:] + radius[:-1])
    x0_km = 7.3  # in the fit's XFACT-scaled units
    amp = 4.0e12
    sigma = 3.0
    prof = super_gaussian(ccx / XFACT, amp, x0_km, sigma)
    stress = {"Ryy": 0.5 * prof, "Rzz": 0.5 * prof, "Rxx": prof}

    centroid = flame_window(ccx, stress)
    # The reference fit returns x0 relative to the masked window start
    # (rmin subtracted), scaled back by XFACT.
    rmin_km = ccx[0] / XFACT
    np.testing.assert_allclose(centroid, (x0_km - rmin_km) * XFACT, rtol=1e-6)


def test_mask_applies():
    radius = np.linspace(0.0, 2.0e6, 129)
    ccx = 0.5 * (radius[1:] + radius[:-1])
    prof = super_gaussian(ccx / XFACT, 1.0e10, 9.0, 2.5)
    stress = {"Ryy": prof, "Rzz": prof}
    mask = np.arange(16, 120)
    centroid = flame_window(ccx, stress, mask)
    assert np.isfinite(centroid)


# ---------------------------------------------------------------------------
# Flame surface density (coarea measure)

import jax.numpy as jnp
import pytest

from fava_tpu.ops.flame import flame_surface


def test_flame_surface_planar_ramp_exact():
    # A linear 0 -> 1 ramp along x: |grad c| = 1/Lx everywhere (central
    # AND one-sided diffs are exact on linear data), so area == planar
    # cross-section exactly and wrinkling == 1.
    nx, ny, nz = 16, 12, 8
    dx, dy, dz = 0.5, 0.25, 0.125
    x = (np.arange(nx) + 0.5) * dx
    c = np.broadcast_to(x[:, None, None] / (nx * dx), (nx, ny, nz)).copy()
    out = flame_surface(jnp.asarray(c), (dx, dy, dz), axis=0)
    planar = (ny * dy) * (nz * dz)
    np.testing.assert_allclose(out["area"], planar, rtol=1e-12)
    np.testing.assert_allclose(out["wrinkling"], 1.0, rtol=1e-12)
    # sigma(x) is the constant slope; x are cell centers.
    np.testing.assert_allclose(out["sigma"], 1.0 / (nx * dx), rtol=1e-12)
    np.testing.assert_allclose(out["x"], x, rtol=1e-12)
    np.testing.assert_allclose(out["thickness"], nx * dx, rtol=1e-12)


def test_flame_surface_tilted_front_sec_factor():
    # A linear field with constant gradient (a, b, 0): the coarea
    # measure is |grad| * V, i.e. wrinkling == |grad| * V / planar —
    # the exact secant factor of a tilted front.
    n = 16
    d = 1.0 / n
    ij = (np.arange(n) + 0.5) * d
    a, b = 1.0, 0.5
    c = a * ij[:, None, None] + b * ij[None, :, None] + np.zeros((n, n, n))
    out = flame_surface(jnp.asarray(c), (d, d, d), axis=0)
    np.testing.assert_allclose(out["wrinkling"], np.hypot(a, b), rtol=1e-12)


@pytest.mark.parametrize("shape", [(16, 12, 8), (16, 12)])
def test_flame_surface_matches_np_gradient_oracle(shape):
    rng = np.random.default_rng(45)
    c = rng.random(shape)
    deltas = tuple(0.1 * (i + 1) for i in range(len(shape)))
    out = flame_surface(jnp.asarray(c), deltas, axis=0)
    grads = np.gradient(c.astype(np.float64), *deltas)
    mag = np.sqrt(sum(g * g for g in grads))
    np.testing.assert_allclose(out["area"], mag.sum() * np.prod(deltas), rtol=1e-12)
    np.testing.assert_allclose(
        out["sigma"], mag.mean(axis=tuple(range(1, len(shape)))), rtol=1e-12
    )
    np.testing.assert_allclose(out["max_gradient"], mag.max(), rtol=1e-12)
    np.testing.assert_allclose(out["thickness"], 1.0 / mag.max(), rtol=1e-12)


def test_flame_surface_tanh_front_thickness():
    # c = 0.5*(1 + tanh((x-x0)/delta)): peak gradient 1/(2*delta), so
    # the gradient thickness is 2*delta (up to grid sampling).
    n, delta = 128, 0.05
    x = (np.arange(n) + 0.5) / n
    c = 0.5 * (1.0 + np.tanh((x - 0.5) / delta))
    vol = np.broadcast_to(c[:, None, None], (n, 8, 8)).copy()
    out = flame_surface(jnp.asarray(vol), (1.0 / n, 1.0 / 8, 1.0 / 8), axis=0)
    # Central differences undersample the peak slope by O((dx/delta)^2)
    # — ~1.4% at delta/dx = 6.4.
    np.testing.assert_allclose(out["thickness"], 2.0 * delta, rtol=2e-2)
    # Full 0 -> 1 sweep: area ~ planar area (up to tail truncation).
    np.testing.assert_allclose(out["wrinkling"], 1.0, rtol=1e-3)


def test_flame_surface_validation_and_mesh(uniform_file):
    import fava_tpu
    from fava_tpu.mesh import FlashUniform

    with pytest.raises(ValueError, match="deltas"):
        flame_surface(jnp.zeros((4, 4, 4)), (1.0, 1.0))
    with pytest.raises(ValueError, match="axis"):
        flame_surface(jnp.zeros((4, 4, 4)), (1.0, 1.0, 1.0), axis=3)
    with pytest.raises(ValueError, match="2D or 3D"):
        flame_surface(jnp.zeros((4,)), (1.0,))

    mesh = FlashUniform(uniform_file)
    mesh.load()
    got = mesh.flame_surface(field="flam", axis=0)
    c = np.asarray(mesh.data("flam"), dtype=np.float64)
    c = c[0] if c.ndim == 4 else c
    lengths = mesh._domain_lengths()
    deltas = [lengths[a] / c.shape[a] for a in range(3)]
    grads = np.gradient(c, *deltas)
    mag = np.sqrt(sum(g * g for g in grads))
    np.testing.assert_allclose(got["area"], mag.sum() * np.prod(deltas), rtol=1e-12)

    m = fava_tpu.FLASH(uniform_file.parent)
    m.load(file_type="uni")
    assert hasattr(m, "flame_surface")
    got2 = m.flame_surface()
    np.testing.assert_allclose(got2["wrinkling"], got["wrinkling"], rtol=1e-12)
