"""Dense MXU DFT vs numpy FFT (float64 exact on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fava_tpu.ops import dft


@pytest.mark.parametrize("shape", [(8, 8, 8), (16, 12, 8), (8, 8, 9), (4, 16, 6)])
def test_rfftn_mxu_matches_numpy(shape):
    rng = np.random.default_rng(3)
    x = rng.standard_normal(shape)
    got = np.asarray(dft.rfftn_mxu(jnp.asarray(x)))
    ref = np.fft.rfftn(x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10)


def test_rfftn_fast_dispatches_off_tpu():
    # On the CPU test backend the jnp.fft path must be taken (exact).
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 8, 8)))
    np.testing.assert_allclose(
        np.asarray(dft.rfftn_fast(x)), np.fft.rfftn(np.asarray(x)), rtol=1e-12, atol=1e-12
    )


def test_axis_helpers_match_numpy():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((6, 10, 8))
    np.testing.assert_allclose(
        np.asarray(dft.rfft_trailing(jnp.asarray(x))),
        np.fft.rfft(x, axis=-1),
        rtol=1e-10,
        atol=1e-10,
    )
    xc = rng.standard_normal((6, 10, 8)) + 1j * rng.standard_normal((6, 10, 8))
    for axis in (0, 1, 2):
        np.testing.assert_allclose(
            np.asarray(dft.fft_axis(jnp.asarray(xc), axis)),
            np.fft.fft(xc, axis=axis),
            rtol=1e-10,
            atol=1e-10,
        )


@pytest.mark.parametrize("shape", [(8, 8, 8), (16, 12, 8), (8, 8, 9), (4, 16, 6)])
def test_irfftn_mxu_roundtrip_and_numpy(shape):
    rng = np.random.default_rng(11)
    x = rng.standard_normal(shape)
    spec = np.fft.rfftn(x)
    got = np.asarray(dft.irfftn_mxu(jnp.asarray(spec), nz=shape[-1]))
    ref = np.fft.irfftn(spec, s=shape, axes=(0, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(got, x, rtol=1e-10, atol=1e-10)


def test_irfft_trailing_ignores_self_conjugate_imag():
    # np.fft.irfft drops the imaginary parts of the k=0 and Nyquist
    # modes; the dense matrices must do the same.
    rng = np.random.default_rng(13)
    spec = rng.standard_normal((4, 5, 5)) + 1j * rng.standard_normal((4, 5, 5))
    got = np.asarray(dft.irfft_trailing(jnp.asarray(spec), n=8))
    np.testing.assert_allclose(got, np.fft.irfft(spec, n=8, axis=-1), rtol=1e-10, atol=1e-10)


def test_irfft_trailing_odd_output():
    rng = np.random.default_rng(17)
    x = rng.standard_normal((4, 6, 9))
    spec = np.fft.rfftn(x)
    got = np.asarray(dft.irfft_trailing(jnp.asarray(np.fft.rfft(x, axis=-1)), n=9))
    np.testing.assert_allclose(got, x, rtol=1e-10, atol=1e-10)
    with pytest.raises(ValueError):
        dft.irfft_trailing(jnp.asarray(spec), n=12)


def test_ifft_axis_matches_numpy():
    rng = np.random.default_rng(19)
    xc = rng.standard_normal((6, 10, 8)) + 1j * rng.standard_normal((6, 10, 8))
    for axis in (0, 1, 2):
        np.testing.assert_allclose(
            np.asarray(dft.ifft_axis(jnp.asarray(xc), axis)),
            np.fft.ifft(xc, axis=axis),
            rtol=1e-10,
            atol=1e-10,
        )


def test_irfftn_fast_dispatches_off_tpu():
    x = np.random.default_rng(23).standard_normal((8, 8, 8))
    spec = np.fft.rfftn(x)
    np.testing.assert_allclose(
        np.asarray(dft.irfftn_fast(jnp.asarray(spec))), x, rtol=1e-12, atol=1e-12
    )


def test_use_mxu_fft_gates():
    assert not dft.use_mxu_fft((8, 8))  # 2D: no
    assert not dft.use_mxu_fft((2048, 8, 8))  # beyond dense regime
    # 3D within range: depends on platform only (CPU here -> False).
    assert not dft.use_mxu_fft((64, 64, 64))



def test_fused_zy_rfft_matches_numpy():
    """The fused z+y Pallas kernel (interpret mode) + x einsum must
    reproduce np.fft.rfftn."""
    from fava_tpu.experiments import pallas_dft
    from fava_tpu.ops import pallas_kernels as pk

    pk.FORCE_INTERPRET = True
    try:
        rng = np.random.default_rng(5)
        v = rng.standard_normal((4, 128, 128))
        assert pallas_dft.use_fused_zy(v.shape)
        got = np.asarray(pallas_dft.rfftn_mxu_fused(jnp.asarray(v)))
        ref = np.fft.rfftn(v)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)
    finally:
        pk.FORCE_INTERPRET = False
