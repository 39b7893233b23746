"""3D real FFTs as dense MXU matmuls.

XLA's TPU FFT lowering is far off the HBM roofline at flagship sizes:
measured 49 ms per 512^3 rfftn against ~5 ms of streaming traffic at
654 GB/s (scripts/tpu_roofline.py, perf_512.json). Applying the DFT as
a dense (n, n) matrix per axis moves the transform onto the MXU, where
the n*N multiply-accumulates per axis cost ~2 ms at ~200 TFLOP/s — the
whole 3D rfft lands near the memory bound instead of 10x above it.

Tradeoffs, by design:
* Dense DFT is O(n)/element vs FFT's O(log n)/element. On TPU the MXU
  makes n <= ~1024 matmul-cheap; beyond that a two-stage Cooley-Tukey
  split would be required (fall back to jnp.fft there).
* Matmuls run at ``Precision.HIGHEST`` (3-pass bf16 emulation of f32):
  max relative error vs the f64 oracle is ~1e-5 at 512^3 (recorded in
  VALIDATION.json), comparable to the f32 FFT path's own rounding.

The reference computes np.fft.fftn on every MPI rank redundantly
(reference: fava/mesh/FLASH/FlashUniform.py:268); this module is the
single-chip TPU-native replacement for the forward transform feeding
the spectra (half-spectrum over the trailing axis, like rfftn).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# Above this axis length the dense-DFT flops (O(n)/element) stop being
# free next to the memory bound; jnp.fft takes over.
MAX_DENSE_AXIS = 1024


# The matrix caches hold HOST arrays: caching device arrays would leak
# tracers when first materialized inside a jit trace.


@lru_cache(maxsize=16)
def _rdft_mats(n: int, dtype_name: str):
    """Real-to-halfcomplex DFT matrices: (cos, -sin), each (n, n//2+1)."""
    k = np.arange(n // 2 + 1)
    j = np.arange(n)[:, None]
    ang = 2.0 * np.pi * j * k / n
    dt = np.dtype(dtype_name)
    return np.cos(ang).astype(dt), (-np.sin(ang)).astype(dt)


@lru_cache(maxsize=16)
def _dft_mat(n: int, dtype_name: str):
    """Complex DFT matrix exp(-2*pi*i*j*k/n), (n, n)."""
    j = np.arange(n)[:, None]
    k = np.arange(n)
    ang = -2.0 * np.pi * j * k / n
    cdt = np.complex128 if np.dtype(dtype_name) == np.float64 else np.complex64
    return np.exp(1j * ang).astype(cdt)


def rfftn_mxu(x: jax.Array, precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """rfftn of a real 3D volume via per-axis dense DFT matmuls.

    Matches ``jnp.fft.rfftn`` (unnormalized, half spectrum along the
    trailing axis) to matmul rounding.
    """
    nx, ny, nz = x.shape
    rdt = x.dtype.name
    cr, ci = _rdft_mats(nz, rdt)
    # z: real -> half spectrum, two real matmuls on the MXU.
    re = jnp.einsum("xyz,zk->xyk", x, cr, precision=precision)
    im = jnp.einsum("xyz,zk->xyk", x, ci, precision=precision)
    w = jax.lax.complex(re, im)
    # y then x: complex DFT matmuls (XLA decomposes to real MXU passes).
    w = jnp.einsum("ab,xbz->xaz", _dft_mat(ny, rdt), w, precision=precision)
    w = jnp.einsum("ab,byz->ayz", _dft_mat(nx, rdt), w, precision=precision)
    return w


def use_mxu_fft(shape) -> bool:
    """Dense-DFT path: on TPU, 3D, axes within the matmul-cheap regime."""
    if len(shape) != 3:
        return False
    if any(int(s) > MAX_DENSE_AXIS or int(s) < 2 for s in shape):
        return False
    return jax.devices()[0].platform == "tpu"


def rfftn_fast(x: jax.Array) -> jax.Array:
    """rfftn via the MXU dense-DFT path on TPU, jnp.fft elsewhere."""
    if use_mxu_fft(x.shape):
        return rfftn_mxu(x)
    return jnp.fft.rfftn(x)
