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
    packed = np.asarray(
        pp.pdf2d_counts(jnp.asarray(x), jnp.asarray(y), xe, ye, weights=jnp.asarray(w)),
        dtype=np.float64,
    )
    got = packed[0] + packed[1]  # double-word planes -> f64
    bins = (xe.astype(np.float32).astype(np.float64), ye.astype(np.float32).astype(np.float64))
    ref, _, _ = np.histogram2d(x, y, bins=bins, weights=w.astype(np.float64))
    # f32 weight products via the Dekker split; double-word cross-step
    # accumulation: only in-chunk MXU rounding remains
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


def test_pallas_pdf2d_counts_traced_edges(force_interpret_pdf2d):
    """The in-trace edge variant (fused Q-R path) matches the host-edge
    kernel bit-for-bit when fed the same f32 edge values."""
    from fava_tpu.ops import pallas_pdf2d as pp

    rng = np.random.default_rng(23)
    n = pp._K + 97
    x = rng.normal(0.0, 1.0, n).astype(np.float32)
    y = rng.normal(0.0, 2.0, n).astype(np.float32)
    xe = np.linspace(-3.0, 3.0, 25).astype(np.float32)
    ye = np.linspace(-6.0, 6.0, 17).astype(np.float32)
    host = np.asarray(pp.pdf2d_counts(jnp.asarray(x), jnp.asarray(y), xe, ye))
    traced = np.asarray(
        jax.jit(
            lambda xv, yv, xev, yev: pp.pdf2d_counts_traced(xv, yv, xev, yev)
        )(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xe), jnp.asarray(ye))
    )
    np.testing.assert_array_equal(traced, host)


def test_invariant_pdfs_kernel_path_matches_xla(force_interpret_pdf2d):
    """gradient_invariant_pdfs through the fused interpret-mode kernel
    agrees with the XLA fallback (same traced edges, both exact), and
    the packed Q_w round-trips through the bitcast row."""
    from fava_tpu.ops import gradients as gr

    rng = np.random.default_rng(24)
    vels = [jnp.asarray(rng.standard_normal((12, 12, 12))) for _ in range(3)]
    kern = gr.gradient_invariant_pdfs(*vels, nbins=(16, 12), qr_range=5.0)
    from fava_tpu.ops import pallas_kernels as pk

    pk.FORCE_INTERPRET = False
    gr._invariant_pdf_fn.cache_clear()
    xla = gr.gradient_invariant_pdfs(*vels, nbins=(16, 12), qr_range=5.0)
    gr._invariant_pdf_fn.cache_clear()
    np.testing.assert_allclose(kern["q_w"], xla["q_w"], rtol=1e-12)
    # interpret kernel compares in f32; the f64 XLA edges can differ by
    # an edge-ulp at bin boundaries — allow single-sample flips only
    assert np.abs(kern["counts"] - xla["counts"]).sum() <= 4


def test_pdf2d_auto_range_fused_matches_histogram2d():
    """Unweighted auto-range takes the ONE-dispatch fused path (traced
    min/max -> traced linspace edges -> histogram, ranges bitcast into
    the counts fetch) and must stay bit-exact vs np.histogram2d's own
    auto-ranging (identical min/max + linspace chain at f64)."""
    rng = np.random.default_rng(31)
    x = rng.normal(2.0, 0.7, 5000)
    y = rng.lognormal(0.0, 0.5, 5000)
    out = vol.pdf2d(jnp.asarray(x), jnp.asarray(y), nbins=(12, 9), density=False)
    ref, xe, ye = np.histogram2d(x, y, bins=(12, 9))
    np.testing.assert_array_equal(out["counts"], ref)
    np.testing.assert_allclose(out["xedges"], xe, rtol=0, atol=0)
    np.testing.assert_allclose(out["yedges"], ye, rtol=0, atol=0)
    assert out["counts"].sum() == 5000  # full range keeps every sample


def test_pdf2d_auto_range_fused_kernel_path(force_interpret_pdf2d):
    rng = np.random.default_rng(32)
    from fava_tpu.ops import pallas_pdf2d as pp

    n = pp._K + 53
    x = rng.normal(0.0, 1.0, n).astype(np.float32)
    y = rng.normal(0.0, 2.0, n).astype(np.float32)
    vol._pdf2d_auto_fn.cache_clear()
    out = vol.pdf2d(jnp.asarray(x), jnp.asarray(y), nbins=(10, 10), density=False)
    vol._pdf2d_auto_fn.cache_clear()
    assert out["counts"].sum() == n
    ref, _, _ = np.histogram2d(
        x.astype(np.float64), y.astype(np.float64), bins=[out["xedges"], out["yedges"]]
    )
    np.testing.assert_array_equal(out["counts"], ref)


def test_pdf2d_auto_range_constant_fields():
    x = jnp.asarray(np.full(257, 3.0))
    out = vol.pdf2d(x, x, nbins=(8, 8), density=False)
    # degenerate range widens to lo + 1 on both axes; everything lands
    # in the first bin (np.histogram2d of a constant does the same)
    assert out["counts"].sum() == 257
    assert out["counts"][0, 0] == 257
    np.testing.assert_allclose(out["xedges"][0], 3.0)
    np.testing.assert_allclose(out["xedges"][-1], 4.0)


def test_pdf1d_auto_range_fused_matches_histogram():
    rng = np.random.default_rng(33)
    x = rng.lognormal(0.0, 0.8, 4001)
    out = vol.pdf1d(jnp.asarray(x), nbins=13, density=True)
    ref, edges = np.histogram(x, bins=13)
    np.testing.assert_array_equal(out["counts"], ref)
    np.testing.assert_allclose(out["edges"], edges, rtol=0, atol=0)
    refpdf, _ = np.histogram(x, bins=13, density=True)
    np.testing.assert_allclose(out["pdf"], refpdf, rtol=1e-12)


def test_pdf1d_auto_range_constant_field():
    x = jnp.asarray(np.full(99, -2.0))
    out = vol.pdf1d(x, nbins=5, density=False)
    assert out["counts"][0] == 99 and out["counts"].sum() == 99
    np.testing.assert_allclose(out["edges"][0], -2.0)
    np.testing.assert_allclose(out["edges"][-1], -1.0)


def test_weighted_pdf1d_no_f32_stall_beyond_2p24():
    """VERDICT r4 weak #5 regression: > 2^24 samples of one CONSTANT
    f32 weight concentrated in ONE bin, f32 config. A plain f32
    accumulator stops absorbing w-sized increments past 2^24 * w
    (here the true sum is 2x that stall point — a plain f32 path would
    come back ~33% low); the double-word blocked sum must match the
    f64 oracle within the documented ~6e-5 worst-case bound."""
    n = (1 << 25) + 4097
    w_val = np.float32(0.30000001192092896)
    with _f32_config():
        v = np.full(n + 2, 0.5, dtype=np.float32)
        v[-2:] = [0.1, 0.9]
        w = np.full(n + 2, w_val, dtype=np.float32)
        out = vol.pdf1d(
            jnp.asarray(v), nbins=4, vrange=(0.0, 1.0), weights=jnp.asarray(w), density=False
        )
    ref, _ = np.histogram(v.astype(np.float64), bins=out["edges"], weights=w.astype(np.float64))
    assert ref[2] > (1 << 25) * 0.3  # the stall regime, by construction
    np.testing.assert_allclose(out["counts"], ref, rtol=1e-5)
    # measured behavior is far inside the bound for constant weights
    np.testing.assert_allclose(out["counts"][2], ref[2], rtol=1e-6)


def test_weighted_binned_statistic_no_f32_stall_beyond_2p24():
    """Same stall regime through binned_statistic: the per-bin weight
    sums, sum(w*yc) and sum(w*yc^2) all cross 2^24 * w in one bin."""
    n = (1 << 25) + 17
    with _f32_config():
        x = np.full(n, 0.5, dtype=np.float32)
        y = np.full(n, 2.0, dtype=np.float32)
        y[: n // 2] = 1.0  # nonzero in-bin variance
        w = np.full(n, np.float32(0.25), dtype=np.float32)  # dyadic: products exact
        out = vol.binned_statistic(
            jnp.asarray(x), jnp.asarray(y), nbins=4, vrange=(0.0, 1.0), weights=jnp.asarray(w)
        )
    wf, yf = w.astype(np.float64), y.astype(np.float64)
    np.testing.assert_allclose(out["weight_sums"][2], wf.sum(), rtol=1e-5)
    mean_ref = (wf * yf).sum() / wf.sum()
    var_ref = (wf * (yf - mean_ref) ** 2).sum() / wf.sum()
    np.testing.assert_allclose(out["mean"][2], mean_ref, rtol=1e-6)
    np.testing.assert_allclose(out["std"][2], np.sqrt(var_ref), rtol=1e-5)
    assert np.isnan(out["mean"][[0, 1, 3]]).all()


def test_weighted_pdf2d_xla_path_no_f32_stall_beyond_2p24():
    """The XLA matmul-histogram weighted path (kernel path is TPU-only)
    accumulates across 2^21-sample chunks: > 2^24 * w in one bin must
    survive the cross-chunk double-word accumulation."""
    n = (1 << 25) + 33
    with _f32_config():
        x = np.full(n, 0.5, dtype=np.float32)
        y = np.full(n, -1.5, dtype=np.float32)
        w = np.full(n, np.float32(0.30000001192092896), dtype=np.float32)
        out = vol.pdf2d(
            jnp.asarray(x),
            jnp.asarray(y),
            nbins=(4, 3),
            xrange=(0.0, 1.0),
            yrange=(-2.0, 1.0),
            weights=jnp.asarray(w),
            density=False,
        )
    total = n * float(np.float64(w[0]))
    np.testing.assert_allclose(out["counts"][2, 0], total, rtol=1e-5)
    assert out["counts"].sum() == out["counts"][2, 0]


def test_blocked_sum_dd_matches_f64_oracle():
    """Direct contract: f32 double-word blocked sum of a rough
    lognormal weight stream matches the f64 pairwise sum to ~1e-7
    relative (plain f32 at this size is ~1e-4-class, and stalls
    entirely when concentrated)."""
    from fava_tpu.utils import twofloat as tf

    rng = np.random.default_rng(5)
    w = np.exp(rng.standard_normal(1 << 22)).astype(np.float32)
    with _f32_config():
        hi, lo = tf.blocked_sum_dd(jnp.asarray(w))
        got = float(np.asarray(hi, dtype=np.float64) + np.asarray(lo, dtype=np.float64))
    ref = w.astype(np.float64).sum()
    np.testing.assert_allclose(got, ref, rtol=1e-7)
