"""Histogram exactness: int32 counting paths (exact to 2^31 per bin),
the scatter-free pdf2d matmul histogram, and the density_pdf hi/lo
count packing. Regression targets: VERDICT r3 weak #3 (f32 per-bin sums
silently lose integer exactness >= 2^24) and weak #4 (pdf2d scatter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fava_tpu.ops import volume as vol


class _f32_config:
    """Temporarily run under the TPU-like f32 config (x64 off)."""

    def __enter__(self):
        self._old = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", False)

    def __exit__(self, *exc):
        jax.config.update("jax_enable_x64", self._old)


def test_pdf1d_counts_exact_beyond_2p24_under_f32():
    """Concentrated distribution: > 2^24 samples in ONE bin, f32 config
    (the TPU accumulation dtype). The int32 counting path must stay
    integer-exact where an f32 per-bin sum rounds."""
    n_big = (1 << 24) + 4097
    with _f32_config():
        v = np.full(n_big + 3, 0.5, dtype=np.float32)
        v[-3:] = [0.1, 0.3, 0.9]  # outliers land outside bin 2 ([0.5, 0.75))
        out = vol.pdf1d(jnp.asarray(v), nbins=4, vrange=(0.0, 1.0), density=False)
    expected, _ = np.histogram(v.astype(np.float64), bins=out["edges"])
    np.testing.assert_array_equal(out["counts"], expected.astype(np.float64))
    assert out["counts"][2] == n_big  # the concentrated bin, exactly


def test_pdf2d_counting_matches_histogram2d():
    rng = np.random.default_rng(11)
    x = rng.random(5000)
    y = rng.random(5000)
    # pin edge semantics: values exactly on interior and final edges
    x[:10] = 0.5
    y[:10] = 1.0
    out = vol.pdf2d(jnp.asarray(x), jnp.asarray(y), nbins=(8, 10), xrange=(0.0, 1.0), yrange=(0.0, 1.0), density=False)
    expected, _, _ = np.histogram2d(x, y, bins=[out["xedges"], out["yedges"]])
    np.testing.assert_array_equal(out["counts"], expected)


def test_pdf2d_counting_exact_beyond_2p24_under_f32():
    n_big = (1 << 24) + 2049
    with _f32_config():
        x = np.full(n_big + 2, 0.25, dtype=np.float32)
        y = np.full(n_big + 2, 0.75, dtype=np.float32)
        x[-2:] = [0.75, 0.9]
        y[-2:] = [0.25, 0.1]
        out = vol.pdf2d(
            jnp.asarray(x), jnp.asarray(y), nbins=(2, 2), xrange=(0.0, 1.0), yrange=(0.0, 1.0), density=False
        )
    assert out["counts"][0, 1] == n_big
    assert out["counts"].sum() == n_big + 2


def test_pdf2d_weighted_matches_histogram2d():
    rng = np.random.default_rng(12)
    x = rng.random(4000)
    y = rng.random(4000)
    w = rng.random(4000)
    out = vol.pdf2d(
        jnp.asarray(x), jnp.asarray(y), weights=jnp.asarray(w), nbins=(6, 5), xrange=(0.0, 1.0), yrange=(0.0, 1.0), density=False
    )
    expected, _, _ = np.histogram2d(x, y, bins=[out["xedges"], out["yedges"]], weights=w)
    np.testing.assert_allclose(out["counts"], expected, rtol=1e-12)


def test_pdf2d_out_of_range_dropped():
    x = np.array([-0.5, 0.2, 1.5, 0.8])
    y = np.array([0.3, 0.3, 0.3, 0.9])
    out = vol.pdf2d(jnp.asarray(x), jnp.asarray(y), nbins=(4, 4), xrange=(0.0, 1.0), yrange=(0.0, 1.0), density=False)
    assert out["counts"].sum() == 2  # only the two in-range points


def test_pdf2d_multi_chunk_padding(monkeypatch):
    """Exercise the data-chunked scan + inf padding with a tiny chunk."""
    monkeypatch.setattr(vol, "_HIST2D_CHUNK", 64)
    vol._hist2d_fn.cache_clear()
    rng = np.random.default_rng(13)
    x = rng.random(301)  # 301 = 4*64 + 45 -> padded final chunk
    y = rng.random(301)
    out = vol.pdf2d(jnp.asarray(x), jnp.asarray(y), nbins=(5, 7), xrange=(0.0, 1.0), yrange=(0.0, 1.0), density=False)
    expected, _, _ = np.histogram2d(x, y, bins=[out["xedges"], out["yedges"]])
    np.testing.assert_array_equal(out["counts"], expected)
    vol._hist2d_fn.cache_clear()


def test_density_pdf_hilo_packing_exact():
    """Unweighted density_pdf counts survive the f32 packed fetch via
    the hi/lo split — exact for bins holding > 2^12 (and odd) counts."""
    rng = np.random.default_rng(14)
    rho = np.exp(rng.standard_normal(40001) * 0.5)  # odd total
    out = vol.density_pdf(jnp.asarray(rho), nbins=8, nsigma=10.0)
    assert out["counts"].sum() == 40001
    np.testing.assert_array_equal(out["counts"], np.round(out["counts"]))


def test_density_pdf_invalid_fixed_srange_raises():
    rho = jnp.asarray(np.full(64, 2.0))
    with pytest.raises(ValueError, match="srange"):
        vol.density_pdf(rho, nbins=4, srange=(1.0, 1.0))
    with pytest.raises(ValueError, match="srange"):
        vol.density_pdf(rho, nbins=4, srange=(2.0, -1.0))


# ---------------------------------------------------------------------------
# Fused Pallas pdf2d kernel (interpret mode; Mosaic path validated on TPU by
# scripts/tpu_pdf2d_probe.py -> pdf2d_probe_512.json)


@pytest.fixture()
def force_interpret_pdf2d():
    from fava_tpu.ops import pallas_kernels as pk

    pk.FORCE_INTERPRET = True
    yield
    pk.FORCE_INTERPRET = False


def test_pallas_pdf2d_counts_exact(force_interpret_pdf2d):
    from fava_tpu.ops import pallas_pdf2d as pp

    rng = np.random.default_rng(21)
    n = 2 * pp._K + 517  # ragged tail exercises the inf padding
    x = rng.normal(1.5, 0.4, n).astype(np.float32)
    y = rng.normal(-0.2, 1.1, n).astype(np.float32)
    xe = np.linspace(float(x.min()), float(x.max()), 101)
    ye = np.linspace(float(y.min()), float(y.max()), 65)
    got = np.asarray(pp.pdf2d_counts(jnp.asarray(x), jnp.asarray(y), xe, ye))
    # oracle on the same f32-rounded edges (the kernel compares in f32)
    bins = (xe.astype(np.float32).astype(np.float64), ye.astype(np.float32).astype(np.float64))
    ref, _, _ = np.histogram2d(x, y, bins=bins)
    assert got.sum() == n  # full range: every sample lands in a bin
    np.testing.assert_array_equal(got, ref.astype(np.int64))


def test_pallas_pdf2d_last_bin_closed_and_oor(force_interpret_pdf2d):
    from fava_tpu.ops import pallas_pdf2d as pp

    xe = np.linspace(0.0, 1.0, 5)
    ye = np.linspace(0.0, 1.0, 5)
    x = np.array([1.0, 1.0, -0.1, 2.0, 0.5], dtype=np.float32)
    y = np.array([1.0, 0.5, 0.5, 0.5, 1.5], dtype=np.float32)
    got = np.asarray(pp.pdf2d_counts(jnp.asarray(x), jnp.asarray(y), xe, ye))
    ref, _, _ = np.histogram2d(x, y, bins=(xe, ye))
    np.testing.assert_array_equal(got, ref.astype(np.int64))
    assert got.sum() == 2  # top-edge pairs kept, out-of-range dropped


def test_pallas_pdf2d_weighted(force_interpret_pdf2d):
    from fava_tpu.ops import pallas_pdf2d as pp

    rng = np.random.default_rng(22)
    n = pp._K + 301
    x = rng.normal(1.5, 0.4, n).astype(np.float32)
    y = rng.normal(-0.2, 1.1, n).astype(np.float32)
    w = np.exp(rng.standard_normal(n)).astype(np.float32)
    xe = np.linspace(float(x.min()), float(x.max()), 33)
    ye = np.linspace(float(y.min()), float(y.max()), 101)
    got = np.asarray(
        pp.pdf2d_counts(jnp.asarray(x), jnp.asarray(y), xe, ye, weights=jnp.asarray(w))
    )
    bins = (xe.astype(np.float32).astype(np.float64), ye.astype(np.float32).astype(np.float64))
    ref, _, _ = np.histogram2d(x, y, bins=bins, weights=w.astype(np.float64))
    # f32 weights, f32 accumulation: summation-order rounding only
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=1e-5)


def test_pdf_empty_inputs():
    e = jnp.asarray(np.empty((0,), dtype=np.float64))
    out = vol.pdf2d(e, e, nbins=(4, 5), xrange=(0.0, 1.0), yrange=(0.0, 1.0), density=False)
    np.testing.assert_array_equal(out["counts"], np.zeros((4, 5)))
    with pytest.raises(ValueError, match="auto-range"):
        vol.pdf2d(e, e, nbins=(4, 5))
    with pytest.raises(ValueError, match="auto-range"):
        vol.pdf1d(e, nbins=4)
    out1 = vol.pdf1d(e, nbins=4, vrange=(0.0, 1.0), density=False)
    np.testing.assert_array_equal(out1["counts"], np.zeros(4))
