"""Fused z+y dense-DFT Pallas kernel.

The dense MXU rfftn (ops/dft.py) applies one matmul per axis, so the
half-spectrum volume streams through HBM once per axis (~3.5 GB of
z+y traffic per 512^3 volume). Both the trailing-axis rfft and the
y-axis DFT contract *within* an x-slab, so one kernel can do both
while the slab intermediate stays in VMEM: read the real slab (1 MB at
512^3), matmul the z-rfft (MXU), matmul the y-DFT (MXU), write the
planar half-spectrum slab — one read + one write of HBM for two of
the three axes.

The x-axis contraction crosses slabs (needs the whole volume) and
stays the XLA dense einsum of ops/dft.py.

Reference counterpart being replaced: np.fft.fftn on every rank
(reference: fava/mesh/FLASH/FlashUniform.py:266-273).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fava_tpu.ops import dft
from fava_tpu.ops import pallas_kernels as pk


def _split_bf16(v):
    hi = v.astype(jnp.bfloat16)
    return hi, (v - hi.astype(v.dtype)).astype(jnp.bfloat16)


def _dot3(p, q):
    """3-pass bf16 emulation of an f32 matmul (drops the lo*lo term) —
    the same decomposition XLA uses for Precision.HIGH, which Mosaic's
    dot lowering does not accept directly."""
    ph, pl_ = _split_bf16(p)
    qh, ql = _split_bf16(q)

    def d(u, w):
        return jax.lax.dot_general(
            u, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    return d(ph, qh) + d(ph, ql) + d(pl_, qh)


def _zy_rfft_kernel(x_ref, czr_ref, czi_ref, wyr_ref, wyi_ref, re_ref, im_ref, *, prec_name):
    if prec_name == "high":
        dot = _dot3
    else:
        dot = lambda p, q: jnp.dot(p, q, precision=jax.lax.Precision.HIGHEST)
    a = x_ref[0]  # (ny, nz) real slab
    zr = dot(a, czr_ref[...])  # (ny, nzr)
    zi = dot(a, czi_ref[...])
    wyr = wyr_ref[...]  # (ny, ny) DFT matrix, planar
    wyi = wyi_ref[...]
    re_ref[0] = dot(wyr, zr) - dot(wyi, zi)
    im_ref[0] = dot(wyr, zi) + dot(wyi, zr)


@lru_cache(maxsize=8)
def _build_zy_rfft_fn(shape: Tuple[int, int, int], dtype_name: str, prec_name: str, interpret: bool):
    nx, ny, nz = shape
    nzr = nz // 2 + 1
    kernel = lambda *refs: _zy_rfft_kernel(*refs, prec_name=prec_name)

    vol_spec = pl.BlockSpec((1, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ny, nzr), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # Constant index maps: the DFT matrices are DMA'd once and kept.
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def run(x, czr, czi, wyr, wyi):
        return pl.pallas_call(
            kernel,
            grid=(nx,),
            in_specs=[vol_spec, mat(nz, nzr), mat(nz, nzr), mat(ny, ny), mat(ny, ny)],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((nx, ny, nzr), x.dtype)] * 2,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x, czr, czi, wyr, wyi)

    return jax.jit(run)


def zy_rfft_planar(x: jax.Array, precision=None):
    """(re, im) of rfft(z-axis) then DFT(y-axis) of a real 3D volume."""
    shape = tuple(int(s) for s in x.shape)
    nx, ny, nz = shape
    precision = dft.PRECISION if precision is None else precision
    # f64 inputs (CPU oracle / interpret runs) must not round through
    # the bf16 emulation; only f32-on-TPU takes the 3-pass path.
    if precision == jax.lax.Precision.HIGHEST or jnp.dtype(x.dtype) == jnp.float64:
        prec_name = "highest"
    else:
        prec_name = "high"
    czr, czi = dft._rdft_mats(nz, x.dtype.name)
    wy = dft._dft_mat(ny, x.dtype.name)
    run = _build_zy_rfft_fn(shape, x.dtype.name, prec_name, pk.FORCE_INTERPRET)
    return run(
        x,
        jnp.asarray(czr),
        jnp.asarray(czi),
        jnp.asarray(wy.real.copy()),
        jnp.asarray(wy.imag.copy()),
    )


def use_fused_zy(shape) -> bool:
    """Fused kernel wants TPU (or interpret), 3D, MXU-friendly extents,
    and slabs that fit VMEM comfortably (ny*nz reals <= 1 MB-ish)."""
    if len(shape) != 3:
        return False
    nx, ny, nz = (int(s) for s in shape)
    if ny % 128 != 0 or nz % 128 != 0 or not (128 <= ny <= 1024 and 128 <= nz <= 1024):
        return False
    if ny * nz > 512 * 512:
        return False
    return pk.on_tpu() or pk.FORCE_INTERPRET


def rfftn_mxu_fused(x: jax.Array, precision=None) -> jax.Array:
    """rfftn via the fused z+y Pallas kernel + dense x-axis einsum.

    Matches ``dft.rfftn_mxu`` (same matrices, same contraction order)
    to matmul rounding.
    """
    re, im = zy_rfft_planar(x, precision)
    return dft.fft_axis(jax.lax.complex(re, im), 0, precision)
