"""Pallas kernels in interpreter mode vs their jnp reference paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fava_tpu.ops import pallas_kernels as pk


@pytest.fixture()
def force_interpret():
    pk.FORCE_INTERPRET = True
    yield
    pk.FORCE_INTERPRET = False


def _fields(n=16, seed=0, dtype=jnp.float32):
    key = jax.random.PRNGKey(seed)
    d = 1.0 + 0.3 * jax.random.uniform(key, (n, n, n), dtype=dtype)
    vs = [jax.random.normal(k, (n, n, n), dtype=dtype) for k in jax.random.split(key, 3)]
    return d, vs


def test_row_moments_interpret_matches_jnp(force_interpret):
    d, vs = _fields(16)
    got = np.asarray(pk.row_moments_volume(d, *vs))
    ref = np.asarray(pk._row_moments_jnp(d, *vs))
    assert got.shape == (13, 16)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)


def test_shell_bin_interpret_matches_jnp(force_interpret):
    d, vs = _fields(16, seed=1)
    total = jnp.abs(vs[0])
    longi = jnp.abs(vs[1])
    trans = total - longi
    nbins = 16 // 2 - 1
    c_got, s_got = pk.shell_bin_sums(total, longi, trans, nbins)
    c_ref, s_ref = pk._shell_bin_jnp(total, longi, trans, nbins)
    np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref))
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), rtol=2e-5, atol=1e-6)


def test_centered_moments_interpret_matches_jnp(force_interpret):
    d, vs = _fields(16, seed=3)
    means = jnp.stack([jnp.mean(v, axis=(1, 2)) for v in vs])
    got = np.asarray(pk.centered_row_moments(d, *vs, means))
    ref = np.asarray(pk._centered_jnp(d, *vs, means))
    assert got.shape == (9, 16)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)


def test_centered_moments_consistent_with_expansion():
    """Centered covariances must equal the algebraic expansion (float64)."""
    import jax

    d, vs = _fields(8, seed=4, dtype=jnp.float64)
    means = jnp.stack([jnp.mean(v, axis=(1, 2)) for v in vs])
    cen = np.asarray(pk._centered_jnp(d, *vs, means))
    mom = np.asarray(pk._row_moments_jnp(d, *vs))
    n_per_row = 64
    pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    m = np.asarray(means)
    dmean_rows = mom[0]
    for p, (i, j) in enumerate(pairs):
        expansion = (
            mom[7 + p] - m[j] * mom[4 + i] - m[i] * mom[4 + j] + m[i] * m[j] * mom[0]
        )
        np.testing.assert_allclose(cen[p], expansion, rtol=1e-9, atol=1e-12)


def test_fallback_used_for_unaligned_shapes():
    # 12^3 violates the lane constraint: must silently use the jnp path.
    key = jax.random.PRNGKey(0)
    d = 1.0 + jax.random.uniform(key, (12, 12, 12))
    vs = [jax.random.normal(k, (12, 12, 12)) for k in jax.random.split(key, 3)]
    out = pk.row_moments_volume(d, *vs)
    assert out.shape == (13, 12)


def test_flagship_float32_produces_no_nans():
    """Regression: the k=0 guard epsilon must not underflow in float32
    (1e-99 -> 0.0 -> 0/0 NaN poisoning every shell via the mask multiply)."""
    from fava_tpu.flagship import make_example_fields, uniform_analysis_step

    fields = make_example_fields(n=16, dtype=jnp.float32)
    out = jax.jit(lambda *f: uniform_analysis_step(*f, mesh=None))(*fields)
    for key in ("spectra_total", "spectra_longitudinal", "spectra_transverse"):
        assert not np.isnan(np.asarray(out[key])).any(), key


def test_flagship_step_consistent_with_mesh_path():
    """mesh=None (kernel path on TPU / jnp fallback on CPU) must agree
    with the sharded-math path run on a single device."""
    from fava_tpu.flagship import uniform_analysis_step
    from fava_tpu.parallel import make_device_mesh

    key = jax.random.PRNGKey(2)
    n = 16
    d = 1.0 + 0.3 * jax.random.uniform(key, (n, n, n))
    vs = [jax.random.normal(k, (n, n, n)) for k in jax.random.split(key, 3)]

    a = jax.jit(lambda *f: uniform_analysis_step(*f, mesh=None))(d, *vs)
    mesh1 = make_device_mesh((1,), ("space",))
    b = jax.jit(lambda *f: uniform_analysis_step(*f, mesh=mesh1))(d, *vs)
    for key_ in ("spectra_total", "spectra_counts", "reynolds_stress", "favre_rms"):
        np.testing.assert_allclose(
            np.asarray(a[key_]), np.asarray(b[key_]), rtol=1e-9, atol=1e-15, err_msg=key_
        )
