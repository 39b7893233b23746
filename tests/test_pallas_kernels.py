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


def test_shell_bin_more_than_128_bins(force_interpret):
    """Regression: shells beyond lane 128 were silently truncated
    (output block hard-coded to LANE wide), corrupting every spectrum
    with max extent >= 258 — including the 512^3 flagship."""
    nbins = 149  # max extent 300 -> bins up to 148 carry real content
    rng = np.random.default_rng(12)
    full = jnp.asarray(np.abs(rng.standard_normal((8, 8, 300))), dtype=jnp.float32)
    c_got, s_got = pk.shell_bin_sums(full, 0.5 * full, 0.5 * full, nbins)
    c_ref, s_ref = pk._shell_bin_jnp(full, 0.5 * full, 0.5 * full, nbins)
    assert np.asarray(c_got).shape == (nbins,)
    assert np.asarray(c_ref)[130:].sum() > 0  # shells beyond lane 128 populated
    np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref))
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), rtol=2e-5, atol=1e-6)

    half = jnp.asarray(np.abs(rng.standard_normal((8, 8, 151))), dtype=jnp.float32)
    c_got, s_got = pk.shell_bin_sums_rfft(half, 0.5 * half, 0.5 * half, nbins, 300)
    c_ref, s_ref = pk._shell_bin_jnp_rfft(half, 0.5 * half, 0.5 * half, nbins, 300)
    assert np.asarray(c_got).shape == (nbins,)
    assert np.asarray(c_ref)[130:].sum() > 0
    np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref))
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), rtol=2e-5, atol=1e-6)


def test_shell_bin_rfft_folded_interpret_matches_jnp(force_interpret):
    """The quadrant-folded rfft binning kernel must reproduce the jnp
    Hermitian-weighted reference on arbitrary half-spectrum volumes."""
    nx, ny, nz = 16, 16, 16
    nzr = nz // 2 + 1
    rng = np.random.default_rng(9)
    total = jnp.asarray(np.abs(rng.standard_normal((nx, ny, nzr))), dtype=jnp.float32)
    longi = jnp.asarray(np.abs(rng.standard_normal((nx, ny, nzr))), dtype=jnp.float32)
    trans = total - longi
    nbins = nx // 2 - 1
    c_got, s_got = pk.shell_bin_sums_rfft(total, longi, trans, nbins, nz)
    c_ref, s_ref = pk._shell_bin_jnp_rfft(total, longi, trans, nbins, nz)
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


def _block_stack(nb=6, nx=8, ny=16, nz=16, seed=5, dtype=jnp.float32, mean_v=0.0):
    key = jax.random.PRNGKey(seed)
    d = 1.0 + 0.3 * jax.random.uniform(key, (nb, nx, ny, nz), dtype=dtype)
    vs = [
        mean_v + jax.random.normal(k, (nb, nx, ny, nz), dtype=dtype)
        for k in jax.random.split(key, 3)
    ]
    return d, vs


def test_block_row_moments_interpret_matches_jnp(force_interpret):
    d, vs = _block_stack()
    got = np.asarray(pk.block_row_moments(d, *vs))
    ref = np.asarray(pk._block_row_moments_jnp(d, *vs))
    assert got.shape == (7, 6, 8)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)


def test_block_centered_moments_interpret_matches_jnp(force_interpret):
    d, vs = _block_stack(seed=6)
    means = jnp.stack([jnp.mean(v, axis=(2, 3)) for v in vs])
    got = np.asarray(pk.block_centered_row_moments(d, *vs, means))
    ref = np.asarray(pk._block_centered_jnp(d, *vs, means))
    assert got.shape == (9, 6, 8)
    # The c1 sums are ~0 by construction; f32 ordering noise is absolute.
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("use_kernels", [False, True])
def test_amr_reynolds_stress_float32_accuracy(use_kernels):
    """The general (multi-block) profile path must hold float32 accuracy
    in the large-mean/small-fluctuation regime via the centered pass."""
    from fava_tpu.ops import profiles as profile_ops

    rng = np.random.default_rng(11)
    nb, nx, ny, nz = 2, 8, 16, 16
    mean_v = [10.0, -8.0, 6.0]
    dens = (1.0 + 0.1 * rng.random((nb, nx, ny, nz))).astype(np.float32).astype(np.float64)
    vels = [
        (mv + 1e-2 * rng.standard_normal((nb, nx, ny, nz))).astype(np.float32).astype(np.float64)
        for mv in mean_v
    ]

    geom = profile_ops.ProfileGeometry(
        block_bounds=np.array(
            [[[0.0, 1.0], [0.0, 1.0], [0.0, 1.0]], [[1.0, 2.0], [0.0, 1.0], [0.0, 1.0]]]
        ),
        refine_level=np.array([1, 1]),
        blocklist=np.array([0, 1]),
        domain_bounds=np.array([[0.0, 2.0], [0.0, 1.0], [0.0, 1.0]]),
        ncells_vec=np.array([nx, ny, nz]),
        nblks_vec=np.array([2, 1, 1]),
        ndim=3,
        raxis=0,
    )

    # f64 oracle: per fine bin (= block row here), centered covariances.
    rows = np.concatenate([dens[0], dens[1]], axis=0)  # (16, ny, nz) along x
    vrows = [np.concatenate([v[0], v[1]], axis=0) for v in vels]
    layer = ny * nz
    means = [v.sum(axis=(1, 2)) / layer for v in vrows]
    pairs = [(i, j) for i in range(3) for j in range(i, 3)]
    expected = {}
    for i, j in pairs:
        cvi = vrows[i] - means[i][:, None, None]
        cvj = vrows[j] - means[j][:, None, None]
        expected[f"R{'xyz'[i]}{'xyz'[j]}"] = (rows * cvi * cvj).sum(axis=(1, 2)) / layer

    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    if use_kernels:
        pk.FORCE_INTERPRET = True
    try:
        data = {"dens": jnp.asarray(dens, dtype=jnp.float32)}
        for a, v in zip("xyz", vels):
            data[f"vel{a}"] = jnp.asarray(v, dtype=jnp.float32)
        _, stress, _ = profile_ops.reynolds_stress(data, geom)
    finally:
        pk.FORCE_INTERPRET = False
        jax.config.update("jax_enable_x64", prev_x64)

    scale = max(np.abs(v).max() for v in expected.values())
    for key_, exp in expected.items():
        err = np.abs(stress[key_] - exp).max() / scale
        assert err < 5e-5, (key_, err)


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


def test_flagship_sharded_branch_float32_accuracy(eight_device_mesh):
    """The sharded branch must use the centered two-pass: in float32,
    small fluctuations on large mean velocities make the one-pass
    algebraic expansion cancel catastrophically (>1e-2 relative here),
    while centering keeps profiles at ~1e-5 of the f64 oracle."""
    from fava_tpu.flagship import uniform_analysis_step
    from fava_tpu.parallel import volume_sharding

    rng = np.random.default_rng(7)
    n = 16
    layer = n * n
    mean_v = [10.0, -8.0, 6.0]
    # Quantize inputs to f32 up front so the oracle and the device see
    # identical values and only algorithmic error is measured.
    dens = (1.0 + 0.1 * rng.random((n, n, n))).astype(np.float32).astype(np.float64)
    vels = [
        (mv + 1e-2 * rng.standard_normal((n, n, n))).astype(np.float32).astype(np.float64)
        for mv in mean_v
    ]

    pairs = [(i, j) for i in range(3) for j in range(i, 3)]
    means = [v.sum(axis=(1, 2)) / layer for v in vels]
    cv = [v - m[:, None, None] for v, m in zip(vels, means)]
    expected = np.stack(
        [(dens * cv[i] * cv[j]).sum(axis=(1, 2)) / layer for i, j in pairs]
    )

    # Show the one-pass expansion really does lose float32 accuracy here.
    d32 = dens.astype(np.float32)
    v32 = [v.astype(np.float32) for v in vels]
    m32 = [v.sum(axis=(1, 2), dtype=np.float32) / layer for v in v32]
    dv32 = [(d32 * v).sum(axis=(1, 2), dtype=np.float32) for v in v32]
    d_row32 = d32.sum(axis=(1, 2), dtype=np.float32)
    onepass = np.stack(
        [
            (
                (d32 * v32[i] * v32[j]).sum(axis=(1, 2), dtype=np.float32)
                - m32[j] * dv32[i]
                - m32[i] * dv32[j]
                + m32[i] * m32[j] * d_row32
            )
            / layer
            for (i, j) in pairs
        ]
    )
    # Errors are normalized by the profile scale (cross terms of
    # independent fluctuations are ~0, making pointwise relative error
    # meaningless there).
    scale = np.abs(expected).max()
    err_onepass = np.abs(onepass - expected).max() / scale
    assert err_onepass > 1e-3  # the regime is genuinely cancellation-prone

    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    try:
        sharding = volume_sharding(eight_device_mesh, 0, 3)
        dd = jax.device_put(jnp.asarray(dens, dtype=jnp.float32), sharding)
        vv = [jax.device_put(jnp.asarray(v, dtype=jnp.float32), sharding) for v in vels]
        out = jax.jit(lambda *f: uniform_analysis_step(*f, mesh=eight_device_mesh))(dd, *vv)
        got = np.asarray(out["reynolds_stress"], dtype=np.float64)
        favre_rms = np.asarray(out["favre_rms"], dtype=np.float64)
    finally:
        jax.config.update("jax_enable_x64", prev_x64)

    err = np.abs(got - expected).max() / scale
    assert err < 5e-5, (err, err_onepass)
    # Favre RMS is sqrt(variance): same cancellation regime, same bar.
    fmean = [(dens * v).sum(axis=(1, 2)) / dens.sum(axis=(1, 2)) for v in vels]
    exp_rms = np.stack(
        [
            np.sqrt((dens * (v - f[:, None, None]) ** 2).sum(axis=(1, 2)) / dens.sum(axis=(1, 2)))
            for v, f in zip(vels, fmean)
        ]
    )
    rel_rms = np.abs(favre_rms - exp_rms) / np.maximum(np.abs(exp_rms), 1e-30)
    assert rel_rms.max() < 5e-4, rel_rms.max()


def test_favre_mean_conditioned_for_zero_mean_velocities():
    """favre_mean must be computed as mu + c1/sum(d): the raw sum(d*v)
    cancels for near-zero-mean velocities and lost ~3e-2 (scaled) in
    f32 on the chip (VALIDATION.json before the fix)."""
    from fava_tpu.flagship import uniform_analysis_step

    rng = np.random.default_rng(3)
    n = 16
    dens = (1.0 + 0.5 * rng.random((n, n, n))).astype(np.float32).astype(np.float64)
    vels = [rng.standard_normal((n, n, n)).astype(np.float32).astype(np.float64) for _ in range(3)]

    d_row = dens.sum(axis=(1, 2))
    exp = np.stack([(dens * v).sum(axis=(1, 2)) / d_row for v in vels])
    scale = max(np.abs(v).max() for v in vels)

    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    try:
        out = jax.jit(lambda *f: uniform_analysis_step(*f, mesh=None))(
            jnp.asarray(dens, dtype=jnp.float32),
            *(jnp.asarray(v, dtype=jnp.float32) for v in vels),
        )
        got = np.asarray(out["favre_mean"], dtype=np.float64)
    finally:
        jax.config.update("jax_enable_x64", prev_x64)

    err = np.abs(got - exp).max() / scale
    assert err < 2e-6, err


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


def test_shell_bin_powers_fused_matches_jnp(force_interpret):
    """The fused powers+fold+bin kernel must reproduce powers->jnp
    binning exactly (f64 interpret mode), including x/y Nyquist rows,
    the kz=0 longitudinal special case, and odd z extents."""
    from fava_tpu.ops.spectra import rfft_power_volumes

    for (nx, ny, nz) in [(16, 16, 16), (8, 16, 9), (16, 8, 8)]:
        nzr = nz // 2 + 1
        rng = np.random.default_rng(nx + ny + nz)
        re = jnp.asarray(rng.standard_normal((3, nx, ny, nzr)))
        im = jnp.asarray(rng.standard_normal((3, nx, ny, nzr)))
        nbins = max(nx, ny, nz) // 2 - 1

        c_got, s_got = pk.shell_bin_powers_fused(re, im, nbins, nz)

        ffts = [re[c] + 1j * im[c] for c in range(3)]
        total, longi, trans, _ = rfft_power_volumes(ffts, (nx, ny, nz))
        c_ref, s_ref = pk._shell_bin_jnp_rfft(total, longi, trans, nbins, nz)
        np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("karatsuba", [False, True])
def test_planar_stacked_transforms_match_numpy(karatsuba):
    from fava_tpu.experiments import planar_dft
    from fava_tpu.ops import dft

    rng = np.random.default_rng(2)
    vols = [rng.standard_normal((8, 12, 10)) for _ in range(3)]
    re, im = planar_dft.rfftn_mxu_planar_stacked([jnp.asarray(v) for v in vols], karatsuba=karatsuba)
    for c in range(3):
        ref = np.fft.rfftn(vols[c])
        np.testing.assert_allclose(np.asarray(re[c]), ref.real, rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(np.asarray(im[c]), ref.imag, rtol=1e-10, atol=1e-10)


def test_shell_bin_folded_v2_matches_jnp(force_interpret):
    """The chunked values-only v2 kernel + static counts must reproduce
    the jnp Hermitian-weighted reference, including odd z extents,
    shapes where the row chunking does not divide evenly, and shapes
    that actually take MULTIPLE row chunks (ny=126 -> rows_f=64,
    rows_c=32: two chunks with nonzero row0 bounds, like the 512^3
    production shape's 264/88 split)."""
    for (nx, ny, nz) in [(16, 16, 16), (16, 16, 9), (32, 16, 16), (16, 16, 400), (16, 126, 16)]:
        nzr = nz // 2 + 1
        nbins = max(nx, ny, nz) // 2 - 1
        rng = np.random.default_rng(nx * ny + nz)
        total = jnp.asarray(np.abs(rng.standard_normal((nx, ny, nzr))), dtype=jnp.float64)
        longi = jnp.asarray(np.abs(rng.standard_normal((nx, ny, nzr))), dtype=jnp.float64)
        trans = total - longi

        folded = [pk._fold_quadrants(v) for v in (total, longi)]
        if ny == 126:  # multi-chunk guard: keep this case meaningful
            assert pk._pick_row_chunk(folded[0].shape[1]) < folded[0].shape[1]
        c_got, s_got = pk.shell_bin_values_folded_v2(*folded, nbins, nx, ny, nz)
        c_ref, s_ref = pk._shell_bin_jnp_rfft(total, longi, trans, nbins, nz)
        np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), rtol=1e-10, atol=1e-12)


def test_shell_bin_folded_v1_kernel_matches_jnp(force_interpret):
    """The one-pass folded v1 kernel stays alive as the probe's
    comparison baseline (scripts/tpu_shellbin_v2_probe.py) — pin it to
    the jnp reference so it cannot silently rot."""
    nx, ny, nz = 16, 16, 16
    nzr = nz // 2 + 1
    rng = np.random.default_rng(21)
    total = jnp.asarray(np.abs(rng.standard_normal((nx, ny, nzr))), dtype=jnp.float64)
    longi = jnp.asarray(np.abs(rng.standard_normal((nx, ny, nzr))), dtype=jnp.float64)
    nbins = nx // 2 - 1
    folded = [pk._fold_quadrants(v) for v in (total, longi)]
    fshape = tuple(int(s) for s in folded[0].shape)
    c_got, s_got = pk._build_shell_folded_fn(fshape, nbins, "float64", True, nx, ny, nz)(*folded)
    c_ref, s_ref = pk._shell_bin_jnp_rfft(total, longi, total - longi, nbins, nz)
    np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), rtol=1e-10, atol=1e-12)


def test_shell_bin_folded_v2_two_traces(force_interpret):
    """Regression: _folded_counts must not cache a jnp constant created
    inside the first jit trace (UnexpectedTracerError when a SECOND jit
    traces the same shape)."""
    pk._folded_counts.cache_clear()
    nx = ny = nz = 16
    nzr = nz // 2 + 1
    rng = np.random.default_rng(3)
    total = jnp.asarray(np.abs(rng.standard_normal((nx, ny, nzr))))
    longi = jnp.asarray(np.abs(rng.standard_normal((nx, ny, nzr))))

    @jax.jit
    def f1(t, l):
        return pk.shell_bin_sums_rfft(t, l, t - l, 7, nz)[0]

    @jax.jit
    def f2(t, l):
        return pk.shell_bin_sums_rfft(t, l, t - l, 7, nz)[0] * 2.0

    c1 = np.asarray(f1(total, longi))
    c2 = np.asarray(f2(total, longi))
    np.testing.assert_allclose(c2, 2.0 * c1)


def test_rfft_shell_counts_odd_extents():
    """Regression: static shell counts must match the dynamic chunk
    accumulation for ODD x/y extents (no Nyquist self-conjugate row)."""
    for shape in [(6, 5, 6), (5, 6, 7), (7, 7, 7), (8, 8, 8)]:
        nx, ny, nz = shape
        nzr = nz // 2 + 1
        nbins = max(shape) // 2 - 1
        t = jnp.ones((nx, ny, nzr))
        c_dyn, _ = pk._shell_bin_jnp_rfft_chunk(t, t, t, nbins, nx, nz, jnp.asarray(0))
        c_stat = pk.rfft_shell_counts(shape, nbins, "float64")
        np.testing.assert_allclose(np.asarray(c_dyn), c_stat, err_msg=str(shape))


def test_chunk_kernel_multi_tile_bounds(force_interpret):
    """The chunk kernel's two-sided shell bounds must be exact when the
    y axis spans MULTIPLE gy tiles, including the tile containing the
    ky sign wrap and the Nyquist |ky| peak (ny=256 -> gy=128, 2 tiles),
    for both the counts and values-only variants."""
    nx, ny, nz = 4, 256, 16
    nzr = nz // 2 + 1
    nbins = ny // 2 - 1
    rng = np.random.default_rng(31)
    total = jnp.asarray(np.abs(rng.standard_normal((nx, ny, nzr))))
    longi = 0.5 * total
    trans = total - longi
    for kx0 in (0, 2):
        c_ref, s_ref = pk._shell_bin_jnp_rfft_chunk(
            total, longi, trans, nbins, 8, nz, jnp.asarray(kx0)
        )
        c_got, s_got = pk.shell_bin_sums_rfft_chunk(
            total, longi, trans, nbins, 8, nz, jnp.asarray(kx0)
        )
        np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref))
        np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), rtol=1e-5, atol=1e-7)
        s_val = pk.shell_bin_values_rfft_chunk(total, longi, nbins, 8, nz, jnp.asarray(kx0))
        np.testing.assert_allclose(np.asarray(s_val), np.asarray(s_ref), rtol=1e-5, atol=1e-7)


def test_chunk_kernel_x_padding(force_interpret):
    """x-blocked chunk kernel with rows_x NOT a multiple of the x block
    (12 rows -> xc=8, one padded block): padded rows must contribute
    nothing to counts or sums, and the signed-kx wrap inside a block
    must bound correctly."""
    nx, ny, nz = 12, 32, 16
    nzr = nz // 2 + 1
    full_nx = 16
    nbins = 15
    rng = np.random.default_rng(7)
    total = jnp.asarray(np.abs(rng.standard_normal((nx, ny, nzr))))
    longi = 0.25 * total
    trans = total - longi
    for kx0 in (0, 3):
        c_ref, s_ref = pk._shell_bin_jnp_rfft_chunk(
            total, longi, trans, nbins, full_nx, nz, jnp.asarray(kx0)
        )
        c_got, s_got = pk.shell_bin_sums_rfft_chunk(
            total, longi, trans, nbins, full_nx, nz, jnp.asarray(kx0)
        )
        np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref))
        np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), rtol=1e-5, atol=1e-7)


def test_fold_pair_kernel_bit_identical(force_interpret):
    """The one-pass Pallas quadrant fold (mirror-slab refs + 0/1
    fold-matrix matmul) must be BIT-identical to the XLA
    slice/flip/pad fold across shapes (0/1 products and <=2-term
    sums are exact even under the bf16x3 dot)."""
    rng = np.random.default_rng(12)
    for full in [(32, 32, 32), (16, 64, 16), (8, 16, 64)]:
        nzr = full[2] // 2 + 1
        t = rng.standard_normal((full[0], full[1], nzr)).astype(np.float32) ** 2
        l = rng.standard_normal((full[0], full[1], nzr)).astype(np.float32) ** 2
        ft_ref = np.asarray(pk._fold_quadrants(jnp.asarray(t)))
        fl_ref = np.asarray(pk._fold_quadrants(jnp.asarray(l)))
        ft, fl = pk.fold_quadrants_pair(jnp.asarray(t), jnp.asarray(l))
        np.testing.assert_array_equal(np.asarray(ft), ft_ref, err_msg=str(full))
        np.testing.assert_array_equal(np.asarray(fl), fl_ref, err_msg=str(full))


def test_multi_z_segment_paths(force_interpret):
    """z extents >= 510 give the v3/chunk kernels TWO in-program
    128-aligned z segments; nothing else in the CPU suite reaches that
    path, so a broken second segment (e.g. a dropped +s0 offset) would
    only surface on hardware (code-review finding). Compare against the
    jnp references on an elongated-z shape."""
    nx, ny, nz = 8, 16, 512
    nzr = nz // 2 + 1
    nbins = nz // 2 - 1
    rng = np.random.default_rng(21)
    total = jnp.asarray(np.abs(rng.standard_normal((nx, ny, nzr))), dtype=jnp.float32)
    longi = 0.5 * total
    trans = total - longi

    # Folded v3/v4 path (via the production dispatcher).
    c_got, s_got = pk.shell_bin_sums_rfft(total, longi, trans, nbins, nz)
    c_ref, s_ref = pk._shell_bin_jnp_rfft(total, longi, trans, nbins, nz)
    np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref))
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), rtol=2e-5, atol=1e-6)

    # Chunk kernel (pod/out-of-core path), counts + values variants.
    c2, s2 = pk.shell_bin_sums_rfft_chunk(total, longi, trans, nbins, nx, nz, jnp.asarray(0))
    c2r, s2r = pk._shell_bin_jnp_rfft_chunk(total, longi, trans, nbins, nx, nz, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c2r))
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r), rtol=2e-5, atol=1e-6)

    # Single-channel scalar variant.
    c3, s3 = pk.shell_bin_sums_rfft_scalar(total, nbins, nz)
    np.testing.assert_allclose(np.asarray(c3), np.asarray(c_ref))
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s_ref)[0], rtol=2e-5, atol=1e-6)


def test_scalar_binning_single_channel(force_interpret):
    """shell_bin_sums_rfft_scalar must equal the two-channel path's
    total sums on ordinary shapes."""
    rng = np.random.default_rng(8)
    p = jnp.asarray(np.abs(rng.standard_normal((16, 16, 9))), dtype=jnp.float32)
    nbins = 7
    c_ref, s_ref = pk._shell_bin_jnp_rfft(p, p, p, nbins, 16)
    c_got, s_got = pk.shell_bin_sums_rfft_scalar(p, nbins, 16)
    np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref))
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref)[0], rtol=2e-5, atol=1e-6)
