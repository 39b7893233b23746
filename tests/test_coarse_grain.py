"""Filtered (coarse-grained) SGS kinetic-energy flux vs the NumPy
oracle, plus the exact discrete identities that pin the conventions:

* all-pass sharp filter  -> Pi vanishes identically (bar == identity),
* sharp filter on a divergence-free field -> <Pi_l> equals the
  spectral flux of ops.velocity.transfer_spectrum at the cutoff shell
  (the Galerkin resolved-energy budget),
* constant density -> exactly density times the incompressible flux.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fava_tpu.ops import coarse_grain as cg
from fava_tpu.ops import velocity as vel_ops
from tests.oracles import coarse_grain as oracle
from tests.test_velocity import _band_limited_solenoidal


def _fields(shape, seed=0, nvel=3):
    rng = np.random.default_rng(seed)
    vels = [rng.standard_normal(shape) for _ in range(nvel)]
    dens = 1.5 + 0.4 * rng.random(shape)
    pres = 2.0 + 0.3 * rng.random(shape)
    return vels, dens, pres


@pytest.mark.parametrize("shape", [(16, 16, 16), (16, 12, 8)])
@pytest.mark.parametrize("kernel", ["gaussian", "sharp"])
def test_favre_flux_matches_oracle(shape, kernel):
    vels, dens, pres = _fields(shape, 1)
    cutoffs = (2.0, 4.0)
    got = cg.filtered_ke_flux(
        *[jnp.asarray(v) for v in vels],
        dens=jnp.asarray(dens),
        pres=jnp.asarray(pres),
        cutoffs=cutoffs,
        kernel=kernel,
        lengths=(1.0, 2.0, 0.5) if shape == (16, 12, 8) else None,
    )
    ref = oracle.filtered_ke_flux_oracle(
        vels,
        dens,
        cutoffs,
        kernel=kernel,
        lengths=(1.0, 2.0, 0.5) if shape == (16, 12, 8) else None,
        pres=pres,
    )
    for key in ("pi_mean", "pi_rms", "baropycnal_mean", "baropycnal_rms"):
        np.testing.assert_allclose(got[key], ref[key], rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(got["scale"], np.pi / np.asarray(cutoffs))


@pytest.mark.parametrize("nd", [2, 3])
def test_incompressible_flux_matches_oracle(nd):
    shape = (16, 16, 16)[:nd]
    vels, _, _ = _fields(shape, 2, nvel=nd)
    got = cg.filtered_ke_flux(
        *[jnp.asarray(v) for v in vels], cutoffs=(3.0,), kernel="gaussian"
    )
    ref = oracle.filtered_ke_flux_oracle(vels, None, (3.0,), kernel="gaussian")
    np.testing.assert_allclose(got["pi_mean"], ref["pi_mean"], rtol=1e-8)
    np.testing.assert_allclose(got["pi_rms"], ref["pi_rms"], rtol=1e-8)


def test_pointwise_fields_match_oracle():
    shape = (12, 16, 8)
    vels, dens, pres = _fields(shape, 3)
    got = cg.sgs_flux_fields(
        *[jnp.asarray(v) for v in vels],
        cutoff=3.0,
        dens=jnp.asarray(dens),
        pres=jnp.asarray(pres),
        kernel="gaussian",
    )
    ref = oracle.sgs_flux_oracle(vels, dens, 3.0, kernel="gaussian", pres=pres)
    np.testing.assert_allclose(np.asarray(got["pi"]), ref["pi"], rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(got["baropycnal"]), ref["baropycnal"], rtol=1e-8, atol=1e-12
    )


def test_all_pass_sharp_filter_gives_zero_flux():
    # k_c beyond every grid mode: bar() is the identity, so the SGS
    # stress tau = bar(rho u u) - rho_b u~ u~ cancels EXACTLY and Pi
    # must be roundoff-zero — the round-trip/normalization check.
    shape = (16, 16, 16)
    vels, dens, _ = _fields(shape, 4)
    kc = np.sqrt(3.0) * 16.0  # > max radial mode
    out = cg.sgs_flux_fields(
        *[jnp.asarray(v) for v in vels], cutoff=kc, dens=jnp.asarray(dens), kernel="sharp"
    )
    scale = float(np.max(np.abs(dens)) * max(np.max(np.abs(v)) for v in vels) ** 2)
    assert float(jnp.max(jnp.abs(out["pi"]))) < 1e-10 * scale


def test_sharp_filter_mean_flux_equals_spectral_flux():
    # Galerkin identity: for divergence-free u and the sharp projector
    # at k_c, <Pi_l> = Pi_spectral(k_c) = -sum_{k<=k_c} T(k). Cutoff
    # k_c = 5.5 keeps exactly shells 0..5 (|k|^2 <= 30), and the band
    # limit (kmax=6 at n=16) keeps every product triad alias-free.
    n = 16
    vels = _band_limited_solenoidal(n=n, kmax=6.0, seed=7)
    tr = vel_ops.transfer_spectrum(*[jnp.asarray(v) for v in vels])
    got = cg.filtered_ke_flux(
        *[jnp.asarray(v) for v in vels], cutoffs=(5.5,), kernel="sharp"
    )
    np.testing.assert_allclose(got["pi_mean"][0], tr["flux"][5], rtol=1e-9, atol=1e-14)


def test_constant_density_reduces_to_incompressible():
    shape = (12, 12, 12)
    vels, _, _ = _fields(shape, 5)
    c = 2.75
    dens = np.full(shape, c)
    comp = cg.filtered_ke_flux(
        *[jnp.asarray(v) for v in vels], dens=jnp.asarray(dens), cutoffs=(3.0, 5.0)
    )
    inc = cg.filtered_ke_flux(*[jnp.asarray(v) for v in vels], cutoffs=(3.0, 5.0))
    np.testing.assert_allclose(comp["pi_mean"], c * inc["pi_mean"], rtol=1e-9)
    np.testing.assert_allclose(comp["pi_rms"], c * inc["pi_rms"], rtol=1e-9)


def test_validation_errors():
    v = jnp.zeros((8, 8, 8))
    with pytest.raises(ValueError, match="kernel"):
        cg.filtered_ke_flux(v, v, v, cutoffs=(2.0,), kernel="boxcar")
    with pytest.raises(ValueError, match="cutoffs"):
        cg.filtered_ke_flux(v, v, v, cutoffs=())
    with pytest.raises(ValueError, match="cutoffs"):
        cg.filtered_ke_flux(v, v, v, cutoffs=(-1.0,))
    with pytest.raises(ValueError, match="density"):
        cg.filtered_ke_flux(v, v, v, pres=v, cutoffs=(2.0,))
    with pytest.raises(ValueError, match="components"):
        cg.filtered_ke_flux(v, v, cutoffs=(2.0,))
    # broadcast-compatible dens/pres mismatches must fail fast — an
    # (n, n, 1) dens with (n, n) velocities silently corrupted Pi_l
    v2 = jnp.zeros((8, 8))
    with pytest.raises(ValueError, match="dens shape"):
        cg.filtered_ke_flux(v2, v2, dens=jnp.zeros((8, 8, 1)), cutoffs=(2.0,))
    with pytest.raises(ValueError, match="pres shape"):
        cg.filtered_ke_flux(
            v, v, v, dens=v, pres=jnp.zeros((8, 8, 1)), cutoffs=(2.0,)
        )


def test_mesh_method_and_registration(uniform_file):
    """Mesh wrapper passes density + PHYSICAL domain lengths; the
    analysis is registered on the model."""
    import fava_tpu
    from fava_tpu.mesh import FlashUniform

    mesh = FlashUniform(uniform_file)
    mesh.load()
    lengths = mesh._domain_lengths()
    vols = {
        n: np.asarray(mesh.data(n)) for n in ("dens", "velx", "vely", "velz")
    }
    vols = {n: (v[0] if v.ndim == 4 else v) for n, v in vols.items()}

    got = mesh.filtered_kinetic_energy_flux(cutoffs=(2.0, 4.0))
    ref = oracle.filtered_ke_flux_oracle(
        [vols["velx"], vols["vely"], vols["velz"]],
        vols["dens"],
        (2.0, 4.0),
        kernel="gaussian",
        lengths=lengths,
    )
    np.testing.assert_allclose(got["pi_mean"], ref["pi_mean"], rtol=1e-8)
    np.testing.assert_allclose(got["pi_rms"], ref["pi_rms"], rtol=1e-8)
    assert "baropycnal_mean" not in got

    # No 'pres' on the synthetic file: with_pressure must fail loudly.
    with pytest.raises(KeyError, match="pres"):
        mesh.filtered_kinetic_energy_flux(with_pressure=True)

    m = fava_tpu.FLASH(uniform_file.parent)
    m.load(file_type="uni")
    out2 = m.filtered_kinetic_energy_flux(cutoffs=(2.0, 4.0))
    np.testing.assert_allclose(out2["pi_mean"], got["pi_mean"], rtol=1e-12)


def test_mesh_with_pressure(tmp_path):
    from fava_tpu.io import synthetic
    from fava_tpu.mesh import FlashUniform

    path = synthetic.make_uniform_file(
        tmp_path / "rt_hdf5_uniform_0003",
        ncells=(12, 12, 12),
        seed=9,
        fields=("dens", "velx", "vely", "velz", "pres"),
    )
    mesh = FlashUniform(path)
    mesh.load()
    out = mesh.filtered_kinetic_energy_flux(cutoffs=(3.0,), with_pressure=True)
    assert np.isfinite(out["baropycnal_mean"]).all()
    assert np.isfinite(out["baropycnal_rms"]).all()
