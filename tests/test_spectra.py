"""Kinetic-energy spectra vs the NumPy oracle, plus sharded-FFT equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fava_tpu
from fava_tpu.mesh import FlashUniform
from fava_tpu.parallel import make_device_mesh, pfft3, use_mesh, volume_sharding
from tests.oracles.spectra import ke_spectra_oracle


@pytest.fixture(scope="module")
def uniform_mesh(tmp_path_factory):
    from fava_tpu.io import synthetic

    path = tmp_path_factory.mktemp("spec") / "rt_hdf5_uniform_0001"
    synthetic.make_uniform_file(path, ncells=(16, 16, 16), seed=5)
    mesh = FlashUniform(path)
    mesh.load()
    return mesh


def test_spectra_match_oracle(uniform_mesh):
    spec = uniform_mesh.kinetic_energy_spectra()

    dens = np.asarray(uniform_mesh.data("dens"), dtype=np.float64)
    vels = [np.asarray(uniform_mesh.data(f"vel{a}"), dtype=np.float64) for a in "xyz"]
    ref = ke_spectra_oracle(dens, vels, federrath_transpose=False)

    np.testing.assert_allclose(spec["k"], ref["k"])
    for key in ("total", "longitudinal", "transverse"):
        np.testing.assert_allclose(spec[key], ref[key], rtol=1e-9, atol=1e-18, err_msg=key)


def test_spectra_total_positive_and_finite(uniform_mesh):
    spec = uniform_mesh.kinetic_energy_spectra()
    assert np.isfinite(spec["total"]).all()
    assert (spec["total"][1:] >= 0).all()
    # k=0 bin gets zero integral factor.
    assert spec["total"][0] == 0.0


def test_pfft3_matches_fftn(eight_device_mesh):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 16, 16))
    sharding = volume_sharding(eight_device_mesh, axis=0, ndim=3)
    xs = jax.device_put(x, sharding)
    got = np.asarray(jax.jit(lambda a: pfft3(a, mesh=eight_device_mesh))(xs))
    ref = np.fft.fftn(x)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)


def test_spectra_sharded_matches_unsharded(uniform_mesh, eight_device_mesh):
    spec_single = uniform_mesh.kinetic_energy_spectra()
    with use_mesh(eight_device_mesh):
        # Re-put data sharded and recompute.
        dens = jax.device_put(
            np.asarray(uniform_mesh.data("dens")), volume_sharding(eight_device_mesh, 0, 3)
        )
        vels = [
            jax.device_put(
                np.asarray(uniform_mesh.data(f"vel{a}")), volume_sharding(eight_device_mesh, 0, 3)
            )
            for a in "xyz"
        ]
        from fava_tpu.ops.spectra import kinetic_energy_spectra

        spec_sharded = kinetic_energy_spectra(dens, vels, mesh=eight_device_mesh)

    for key in ("total", "longitudinal", "transverse"):
        np.testing.assert_allclose(
            spec_sharded[key], spec_single[key], rtol=1e-9, atol=1e-18, err_msg=key
        )


def test_reference_transpose_quirk_documented():
    """The reference's stray .T changes results; our kernel matches the
    correct projection, not the quirk (deviation documented in ops.spectra)."""
    rng = np.random.default_rng(1)
    dens = rng.random((8, 8, 8)) + 0.5
    vels = [rng.standard_normal((8, 8, 8)) for _ in range(3)]
    correct = ke_spectra_oracle(dens, vels, federrath_transpose=False)
    quirk = ke_spectra_oracle(dens, vels, federrath_transpose=True)
    # total is unaffected; longitudinal differs.
    np.testing.assert_allclose(correct["total"], quirk["total"])
    assert not np.allclose(correct["longitudinal"], quirk["longitudinal"])
