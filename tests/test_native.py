"""Native C++ transpose kernel vs NumPy reference."""

import numpy as np
import pytest

from fava_tpu.native import native_available, swap_axes_cast


@pytest.mark.parametrize(
    "src_dt,dst_dt",
    [(np.float32, np.float64), (np.float32, np.float32), (np.float64, np.float64), (np.float64, np.float32)],
)
def test_swap_axes_cast_4d(src_dt, dst_dt):
    rng = np.random.default_rng(0)
    x = rng.random((5, 8, 6, 4)).astype(src_dt)
    got = swap_axes_cast(x, dst_dt)
    ref = np.ascontiguousarray(np.swapaxes(x.astype(dst_dt), -1, -3))
    assert got.dtype == np.dtype(dst_dt)
    np.testing.assert_array_equal(got, ref)


def test_swap_axes_cast_3d():
    rng = np.random.default_rng(1)
    x = rng.random((8, 6, 4)).astype(np.float32)
    got = swap_axes_cast(x, np.float64)
    ref = np.ascontiguousarray(np.swapaxes(x.astype(np.float64), -1, -3))
    assert got.shape == (4, 6, 8)
    np.testing.assert_array_equal(got, ref)


def test_swap_axes_cast_large_tiles():
    # Exercise multiple TILE blocks and the remainder path.
    rng = np.random.default_rng(2)
    x = rng.random((2, 70, 9, 130)).astype(np.float32)
    got = swap_axes_cast(x, np.float64)
    ref = np.ascontiguousarray(np.swapaxes(x.astype(np.float64), -1, -3))
    np.testing.assert_array_equal(got, ref)


def test_unsupported_dtype_falls_back():
    x = np.arange(2 * 3 * 4, dtype=np.int32).reshape(2, 3, 4)
    got = swap_axes_cast(x, np.float64)
    ref = np.ascontiguousarray(np.swapaxes(x.astype(np.float64), -1, -3))
    np.testing.assert_array_equal(got, ref)


def test_native_builds_on_this_host():
    # The image ships g++; the native path must actually be active.
    assert native_available()
