"""Pallas TPU kernels for the hot reduction paths.

Two fused kernels replace the XLA-generated code where it underperforms:

* ``row_moments_volume`` — the 13 per-row moments feeding Reynolds/
  Favre profiles (dens, v_i, dens*v_i, dens*v_i*v_j). XLA emits ~13
  separate reduction passes over the fields (~59 ms at 256^3 measured);
  the kernel streams each x-slab through VMEM once and computes all 13
  sums in a single pass (~memory-bound: 4 field reads total).

* ``shell_bin_sums`` — spherical-shell binning of the spectral power
  volumes. The gather/scatter formulations are slow on TPU (174 ms for
  a 16M-point gather at 256^3); the kernel recomputes the shell index
  of each k-cell on the fly from iota (no index memory traffic at all)
  and accumulates per-shell sums via an outer-product update, reading
  the three power volumes exactly once.

Both kernels fall back to jnp implementations off-TPU (CPU tests use
the jnp paths in float64).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NMOM = 13

# Tests set this to run the kernels in interpreter mode on CPU.
FORCE_INTERPRET = False

# In-program z segments for the folded v2 shell-binning kernel: each
# 128-aligned segment runs its own reachable-shell bound loop. In the
# v2 (x-unblocked) kernel splitting measured SLOWER (98.1 vs 95.0 ms
# spectra path, zsplit_512.json — the kernel is iteration-overhead-
# bound and segments add iterations), so v2 keeps 1; the production
# x-blocked v3 kernel amortizes that overhead and uses 2 segments.
Z_SPLITS_DEFAULT = 1


def path_key():
    """Backend-dependent dispatch state that gets baked into cached
    traces (the binning-path choice). ONE definition for every jit
    cache key that must not serve a trace built under a different
    state (ops.spectra._build_spectra_fn, flagship's jitted steps)."""
    return (jax.devices()[0].platform, FORCE_INTERPRET)


def _z_segments(nzr: int, z_splits: int):
    """128-aligned in-program z segments partitioning [0, nzr) (shared
    by the v2/v3 folded and chunk binning builders)."""
    blk128 = max(1, nzr // 128)
    nseg = max(1, min(int(z_splits), blk128))
    per = blk128 // nseg
    starts = [s * per * 128 for s in range(nseg)]
    return tuple((s0, s1) for s0, s1 in zip(starts, starts[1:] + [nzr]))


def _pad_x(arrays, x_pad: int):
    """Zero-pad the leading (slab) axis (shared by the x-blocked
    binning builders; padded rows carry zeros and bin nothing)."""
    if not x_pad:
        return arrays
    cfg = ((0, x_pad, 0), (0, 0, 0), (0, 0, 0))
    return [jax.lax.pad(a, jnp.asarray(0, a.dtype), cfg) for a in arrays]


def on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _pallas_ok(shape: Tuple[int, int, int]) -> bool:
    nx, ny, nz = shape
    return (on_tpu() or FORCE_INTERPRET) and nz % LANE == 0 and ny % 8 == 0


# ---------------------------------------------------------------------------
# Fused 13-moment row reduction


def _sum2(x):
    # Two-stage reduction: error grows ~ (ny+nz)*eps instead of
    # (ny*nz)*eps under Mosaic's sequential accumulation. keepdims keeps
    # the intermediate 2D (Mosaic cannot lower 1D reductions).
    return jnp.sum(jnp.sum(x, axis=-1, keepdims=True))


def _moments_kernel(d_ref, x_ref, y_ref, z_ref, out_ref):
    d = d_ref[0]
    vx = x_ref[0]
    vy = y_ref[0]
    vz = z_ref[0]

    dvx = d * vx
    dvy = d * vy
    dvz = d * vz

    sums = jnp.stack(
        [
            _sum2(d),
            _sum2(vx),
            _sum2(vy),
            _sum2(vz),
            _sum2(dvx),
            _sum2(dvy),
            _sum2(dvz),
            _sum2(dvx * vx),
            _sum2(dvx * vy),
            _sum2(dvx * vz),
            _sum2(dvy * vy),
            _sum2(dvy * vz),
            _sum2(dvz * vz),
        ]
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    padded = jnp.zeros((1, LANE), dtype=out_ref.dtype)
    for m in range(NMOM):
        padded = jnp.where(lane == m, sums[m], padded)
    i = pl.program_id(0)
    out_ref[pl.ds(i, 1), :] = padded


@lru_cache(maxsize=8)
def _build_moments_fn(shape: Tuple[int, int, int], dtype_name: str, interpret: bool = False):
    nx, ny, nz = shape
    dtype = jnp.dtype(dtype_name)

    slab = pl.BlockSpec((1, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def run(d, vx, vy, vz):
        out = pl.pallas_call(
            _moments_kernel,
            grid=(nx,),
            in_specs=[slab, slab, slab, slab],
            # Full-array output block kept resident across grid steps;
            # each step writes its own row.
            out_specs=pl.BlockSpec((nx, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nx, LANE), dtype),
            interpret=interpret,
        )(d, vx, vy, vz)
        return out[:, :NMOM].T  # (13, nx)

    return jax.jit(run)


def row_moments_volume(dens: jax.Array, vx: jax.Array, vy: jax.Array, vz: jax.Array) -> jax.Array:
    """(13, nx) row moments of a uniform volume, profile along x.

    Moment order matches ops.profiles._row_moments for ndim=3:
    [d, vx, vy, vz, d*vx, d*vy, d*vz, d*vxvx, d*vxvy, d*vxvz, d*vyvy, d*vyvz, d*vzvz].
    """
    shape = tuple(int(s) for s in dens.shape)
    if not _pallas_ok(shape):
        return _row_moments_jnp(dens, vx, vy, vz)
    return _build_moments_fn(shape, str(dens.dtype), FORCE_INTERPRET)(dens, vx, vy, vz)


@jax.jit
def _row_moments_jnp(d, vx, vy, vz):
    rows = lambda a: jnp.sum(a, axis=(1, 2))
    dvx, dvy, dvz = d * vx, d * vy, d * vz
    return jnp.stack(
        [
            rows(d),
            rows(vx),
            rows(vy),
            rows(vz),
            rows(dvx),
            rows(dvy),
            rows(dvz),
            rows(dvx * vx),
            rows(dvx * vy),
            rows(dvx * vz),
            rows(dvy * vy),
            rows(dvy * vz),
            rows(dvz * vz),
        ]
    )


# ---------------------------------------------------------------------------
# Centered second moments (pass 2 of the uniform-grid Reynolds stress)
#
# The one-pass algebraic expansion sum(d*vi*vj) - m*sum(d*vi) + ...
# cancels catastrophically in float32 when fluctuations are small
# relative to means (~3e-4 relative observed). Given the per-row means
# m_i from pass 1, this kernel computes sum(d*(vi-m_i)*(vj-m_j)) and
# sum(d*(vi-m_i)) directly — no cancellation, still one fused read.

NCEN = 9  # 6 centered covariances + 3 centered first moments


def _centered_kernel(means_ref, d_ref, x_ref, y_ref, z_ref, out_ref):
    i = pl.program_id(0)
    d = d_ref[0]
    cx = x_ref[0] - means_ref[0, i]
    cy = y_ref[0] - means_ref[1, i]
    cz = z_ref[0] - means_ref[2, i]

    dcx = d * cx
    dcy = d * cy
    dcz = d * cz

    sums = jnp.stack(
        [
            _sum2(dcx * cx),
            _sum2(dcx * cy),
            _sum2(dcx * cz),
            _sum2(dcy * cy),
            _sum2(dcy * cz),
            _sum2(dcz * cz),
            _sum2(dcx),
            _sum2(dcy),
            _sum2(dcz),
        ]
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    padded = jnp.zeros((1, LANE), dtype=out_ref.dtype)
    for m in range(NCEN):
        padded = jnp.where(lane == m, sums[m], padded)
    out_ref[pl.ds(i, 1), :] = padded


@lru_cache(maxsize=8)
def _build_centered_fn(shape: Tuple[int, int, int], dtype_name: str, interpret: bool = False):
    nx, ny, nz = shape
    dtype = jnp.dtype(dtype_name)
    # With scalar prefetch, index maps receive the prefetch refs too.
    slab = pl.BlockSpec((1, ny, nz), lambda i, m: (i, 0, 0), memory_space=pltpu.VMEM)

    def run(means, d, vx, vy, vz):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nx,),
            in_specs=[slab, slab, slab, slab],
            out_specs=pl.BlockSpec((nx, LANE), lambda i, m: (0, 0), memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            _centered_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nx, LANE), dtype),
            interpret=interpret,
        )(means, d, vx, vy, vz)
        return out[:, :NCEN].T  # (9, nx)

    return jax.jit(run)


def centered_row_moments(
    dens: jax.Array,
    vx: jax.Array,
    vy: jax.Array,
    vz: jax.Array,
    means: jax.Array,  # (3, nx) per-row velocity means
) -> jax.Array:
    """(9, nx): [sum d*ci*cj (6 pairs xx,xy,xz,yy,yz,zz), sum d*ci (3)]."""
    shape = tuple(int(s) for s in dens.shape)
    if not _pallas_ok(shape):
        return _centered_jnp(dens, vx, vy, vz, means)
    return _build_centered_fn(shape, str(dens.dtype), FORCE_INTERPRET)(
        means.astype(dens.dtype), dens, vx, vy, vz
    )


@jax.jit
def _centered_jnp(d, vx, vy, vz, means):
    rows = lambda a: jnp.sum(a, axis=(1, 2))
    cx = vx - means[0][:, None, None]
    cy = vy - means[1][:, None, None]
    cz = vz - means[2][:, None, None]
    dcx, dcy, dcz = d * cx, d * cy, d * cz
    return jnp.stack(
        [
            rows(dcx * cx),
            rows(dcx * cy),
            rows(dcx * cz),
            rows(dcy * cy),
            rows(dcy * cz),
            rows(dcz * cz),
            rows(dcx),
            rows(dcy),
            rows(dcz),
        ]
    )


# ---------------------------------------------------------------------------
# Batched block-stack moments (AMR profile paths)
#
# AMR leaf stacks are (nB, ncx, ncy, ncz) with small per-block extents
# (16^3 is typical), so the single-volume kernels' lane constraint
# (nz % 128) never holds. Flattening each (block, row) to one row of
# ncy*ncz lanes (256 for 16^3 blocks) restores lane alignment, and the
# kernels stream R rows per grid step through VMEM computing all
# moments in one fused read — replacing the ~13 separate XLA reduction
# passes over multi-block plt series (reference workload:
# fava/mesh/FLASH/_flash.py:1564-1604).

NRAW = 7  # d, v_i, d*v_i


def _pick_row_block(nrows: int, ncols: int, nfields: int = 4, budget: int = 4 << 20) -> int:
    """Rows per grid step: largest power-of-two divisor fitting VMEM."""
    max_rows = max(1, budget // (max(1, ncols) * 4 * nfields))
    r = 1
    while r * 2 <= min(nrows, max_rows, 512) and nrows % (r * 2) == 0:
        r *= 2
    return r


def _lane_iota(rows: int):
    return jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)


def _pack_lanes(sums, out_dtype, rows: int):
    """Stack per-row scalars (each (R,1)) into lanes 0..len(sums)-1."""
    lane = _lane_iota(rows)
    out = jnp.zeros((rows, LANE), dtype=out_dtype)
    for m, s in enumerate(sums):
        out = jnp.where(lane == m, s, out)
    return out


def _raw_rows_kernel(d_ref, x_ref, y_ref, z_ref, out_ref):
    d = d_ref[...]
    vx = x_ref[...]
    vy = y_ref[...]
    vz = z_ref[...]

    def rsum(a):
        return jnp.sum(a, axis=-1, keepdims=True)

    sums = [
        rsum(d),
        rsum(vx),
        rsum(vy),
        rsum(vz),
        rsum(d * vx),
        rsum(d * vy),
        rsum(d * vz),
    ]
    out_ref[...] = _pack_lanes(sums, out_ref.dtype, d.shape[0])


def _centered_rows_kernel(m_ref, d_ref, x_ref, y_ref, z_ref, out_ref):
    d = d_ref[...]
    rows = d.shape[0]
    m = m_ref[...]  # (R, LANE), lanes 0..2 hold the row velocity means
    lane = _lane_iota(rows)

    def pick(k):
        # Masked-sum extraction of lane k: sub-128 lane slices don't
        # lower on TPU, a reduction does.
        return jnp.sum(jnp.where(lane == k, m, 0), axis=-1, keepdims=True)

    cx = x_ref[...] - pick(0)
    cy = y_ref[...] - pick(1)
    cz = z_ref[...] - pick(2)
    dcx = d * cx
    dcy = d * cy
    dcz = d * cz

    def rsum(a):
        return jnp.sum(a, axis=-1, keepdims=True)

    sums = [
        rsum(dcx * cx),
        rsum(dcx * cy),
        rsum(dcx * cz),
        rsum(dcy * cy),
        rsum(dcy * cz),
        rsum(dcz * cz),
        rsum(dcx),
        rsum(dcy),
        rsum(dcz),
    ]
    out_ref[...] = _pack_lanes(sums, out_ref.dtype, rows)


@lru_cache(maxsize=16)
def _build_block_moments_fn(nrows: int, ncols: int, dtype_name: str, interpret: bool):
    dtype = jnp.dtype(dtype_name)
    r = _pick_row_block(nrows, ncols)
    slab = pl.BlockSpec((r, ncols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((r, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def run(d, vx, vy, vz):
        out = pl.pallas_call(
            _raw_rows_kernel,
            grid=(nrows // r,),
            in_specs=[slab] * 4,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((nrows, LANE), dtype),
            interpret=interpret,
        )(d, vx, vy, vz)
        return out[:, :NRAW].T  # (7, nrows)

    return jax.jit(run)


@lru_cache(maxsize=16)
def _build_block_centered_fn(nrows: int, ncols: int, dtype_name: str, interpret: bool):
    dtype = jnp.dtype(dtype_name)
    r = _pick_row_block(nrows, ncols, nfields=5)
    slab = pl.BlockSpec((r, ncols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mean_spec = pl.BlockSpec((r, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((r, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def run(means_pad, d, vx, vy, vz):
        out = pl.pallas_call(
            _centered_rows_kernel,
            grid=(nrows // r,),
            in_specs=[mean_spec] + [slab] * 4,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((nrows, LANE), dtype),
            interpret=interpret,
        )(means_pad, d, vx, vy, vz)
        return out[:, :NCEN].T  # (9, nrows)

    return jax.jit(run)


def _rows_ok(nrows: int, ncols: int, nfields: int = 4) -> bool:
    """Kernel path legality: lane-aligned columns AND a legal row block
    (divisible by 8 or the full row extent) that fits VMEM. Huge
    per-row extents (e.g. 1024^2 lanes) force 1-row blocks, which
    Mosaic refuses — the jnp fallback handles those."""
    if not ((on_tpu() or FORCE_INTERPRET) and ncols % LANE == 0):
        return False
    r = _pick_row_block(nrows, ncols, nfields=nfields)
    return r == nrows or r % 8 == 0


def block_row_moments(dens: jax.Array, vx: jax.Array, vy: jax.Array, vz: jax.Array):
    """(7, nB, nx) fused raw moments [d, v_i, d*v_i] of a block stack.

    Falls back to jnp off-TPU or when ncy*ncz is not lane-aligned.
    """
    nb, nx, ny, nz = (int(s) for s in dens.shape)
    ncols = ny * nz
    if not _rows_ok(nb * nx, ncols):
        return _block_row_moments_jnp(dens, vx, vy, vz)
    flat = [a.reshape(nb * nx, ncols) for a in (dens, vx, vy, vz)]
    out = _build_block_moments_fn(nb * nx, ncols, str(dens.dtype), FORCE_INTERPRET)(*flat)
    return out.reshape(NRAW, nb, nx)


@jax.jit
def _block_row_moments_jnp(d, vx, vy, vz):
    rows = lambda a: jnp.sum(a, axis=(2, 3))
    return jnp.stack([rows(d), rows(vx), rows(vy), rows(vz), rows(d * vx), rows(d * vy), rows(d * vz)])


def block_centered_row_moments(
    dens: jax.Array,
    vx: jax.Array,
    vy: jax.Array,
    vz: jax.Array,
    means: jax.Array,  # (3, nB, nx) per-(block, row) velocity means
):
    """(9, nB, nx): [sum d*ci*cj (6 pairs), sum d*ci (3)] per block row."""
    nb, nx, ny, nz = (int(s) for s in dens.shape)
    ncols = ny * nz
    if not _rows_ok(nb * nx, ncols, nfields=5):
        return _block_centered_jnp(dens, vx, vy, vz, means)
    flat = [a.reshape(nb * nx, ncols) for a in (dens, vx, vy, vz)]
    m = means.astype(dens.dtype).reshape(3, nb * nx).T  # (rows, 3)
    means_pad = jnp.zeros((nb * nx, LANE), dtype=dens.dtype).at[:, :3].set(m)
    out = _build_block_centered_fn(nb * nx, ncols, str(dens.dtype), FORCE_INTERPRET)(
        means_pad, *flat
    )
    return out.reshape(NCEN, nb, nx)


@jax.jit
def _block_centered_jnp(d, vx, vy, vz, means):
    rows = lambda a: jnp.sum(a, axis=(2, 3))
    cx = vx - means[0][..., None, None].astype(vx.dtype)
    cy = vy - means[1][..., None, None].astype(vy.dtype)
    cz = vz - means[2][..., None, None].astype(vz.dtype)
    dcx, dcy, dcz = d * cx, d * cy, d * cz
    return jnp.stack(
        [
            rows(dcx * cx),
            rows(dcx * cy),
            rows(dcx * cz),
            rows(dcy * cy),
            rows(dcy * cz),
            rows(dcz * cz),
            rows(dcx),
            rows(dcy),
            rows(dcz),
        ]
    )


# ---------------------------------------------------------------------------
# Spherical-shell binning


def _bins_width(nbins: int) -> int:
    """Output lane width: bins padded up to a LANE multiple. (Round 1
    hard-coded LANE, silently truncating spectra to 128 shells for any
    volume with max extent >= 258 — e.g. the 512^3 flagship.)"""
    return ((nbins + 1 + LANE - 1) // LANE) * LANE


def _shell_kernel(t_ref, l_ref, out_ref, *, nx, ny, nz, nbins, full_nz):
    """full_nz == nz: full k-grid. full_nz > nz: rfft half-grid along z —
    each interior kz plane stands for its conjugate too (weight 2)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def wavenum(idx, n):
        return jnp.where(idx <= (n - 1) // 2, idx, idx - n).astype(jnp.float32)

    kx = wavenum(i, nx)
    jy = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
    jz = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 1)
    ky = wavenum(jy, ny)
    if full_nz == nz:
        kzf = wavenum(jz, nz)
        weight = None
    else:
        kzf = jz.astype(jnp.float32)  # non-negative half spectrum
        # kz planes are self-conjugate (weight 1) only at kz=0 and, for
        # even full_nz, at the Nyquist plane; odd full_nz has no Nyquist
        # plane so every interior kz carries its conjugate (weight 2).
        if full_nz % 2 == 0:
            weight = jnp.where((jz == 0) | (jz == full_nz // 2), 1.0, 2.0)
        else:
            weight = jnp.where(jz == 0, 1.0, 2.0)

    k_abs = jnp.sqrt(kx * kx + ky * ky + kzf * kzf)
    shell = jnp.floor(k_abs + 0.5).astype(jnp.int32)
    valid = k_abs <= (nbins - 0.5)
    shell = jnp.where(valid, jnp.minimum(shell, nbins - 1), nbins)  # overflow -> nbins

    t = t_ref[0]
    l = l_ref[0]

    width = _bins_width(nbins)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)

    # Only count/total/longitudinal are accumulated: transverse sums
    # follow exactly as total - longitudinal outside the kernel.
    def body(b, acc):
        m = (shell == b).astype(t.dtype)
        if weight is not None:
            m = m * weight
        partial = jnp.stack([_sum2(m), _sum2(t * m), _sum2(l * m)])
        onehot = (lane == b).astype(acc.dtype)
        return acc + partial[:, None] * onehot

    # Shells below floor(|kx|+0.5) are unreachable in this slab (|k| >= |kx|),
    # so start the bin loop there — halves the loop work on average.
    # (A tighter per-ky-chunk bound crashes the Mosaic compiler on
    # sublane slices of odd-lane arrays; not worth fighting for ~50ms.)
    b_lo = jnp.maximum(jnp.floor(jnp.abs(kx) - 0.5).astype(jnp.int32), 0)
    acc = jax.lax.fori_loop(b_lo, nbins, body, jnp.zeros((3, width), dtype=out_ref.dtype))
    out_ref[...] += acc


@lru_cache(maxsize=8)
def _build_shell_fn(
    shape: Tuple[int, int, int],
    nbins: int,
    dtype_name: str,
    interpret: bool = False,
    full_nz: int = 0,
):
    nx, ny, nz = shape
    full_nz = full_nz or nz
    dtype = jnp.dtype(dtype_name)
    slab = pl.BlockSpec((1, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    kernel = partial(_shell_kernel, nx=nx, ny=ny, nz=nz, nbins=nbins, full_nz=full_nz)
    width = _bins_width(nbins)

    def run(total, longi, trans):
        out = pl.pallas_call(
            kernel,
            grid=(nx,),
            in_specs=[slab, slab],
            out_specs=pl.BlockSpec((3, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, width), dtype),
            interpret=interpret,
        )(total, longi)
        counts = out[0, :nbins]
        t_sum = out[1, :nbins]
        l_sum = out[2, :nbins]
        # trans = total - longi holds bin-wise in exact arithmetic.
        return counts, jnp.stack([t_sum, l_sum, t_sum - l_sum])

    return jax.jit(run)


def shell_bin_sums(total: jax.Array, longi: jax.Array, trans: jax.Array, nbins: int):
    """Per-shell (counts, sums[3]) of three power volumes.

    Shell index floor(|k|+0.5) with the right-inclusive last edge of
    scipy.stats.binned_statistic (reference: FlashUniform.py:286-293).
    """
    shape = tuple(int(s) for s in total.shape)
    if not _pallas_ok(shape):
        return _shell_bin_jnp(total, longi, trans, nbins)
    return _build_shell_fn(shape, int(nbins), str(total.dtype), FORCE_INTERPRET)(
        total, longi, trans
    )


def shell_bin_sums_rfft(
    total: jax.Array, longi: jax.Array, trans: jax.Array, nbins: int, full_nz: int
):
    """Shell binning of half-spectrum (rfft) power volumes.

    Exact for real fields: Hermitian symmetry makes every power even in
    k, so interior kz planes carry weight 2 and the kz=0 / kz=n/2
    planes weight 1 — identical results to full-grid binning at half
    the FFT and binning cost.

    On TPU with even x/y extents, the +-kx and +-ky quadrants are first
    FOLDED onto the non-negative quadrant (binning is linear and the
    shell index depends only on |k|), quartering the kernel's per-bin
    mask-loop work — the binning VPU cost drops ~4x (measured ~52 ms ->
    ~15 ms at 512^3).
    """
    shape = tuple(int(s) for s in total.shape)
    nx, ny, nzr = shape
    if (on_tpu() or FORCE_INTERPRET) and nx % 2 == 0 and ny % 2 == 0:
        # One-pass Pallas fold (mirror-slab refs + fold-matrix matmul)
        # instead of the XLA slice/flip/pad passes — the lax.rev
        # relayouts cost ~3 ms per axis at 512^3.
        folded = fold_quadrants_pair(total, longi)
        # v2: row-chunked values-only kernel + static counts — measured
        # 103.5 -> 96.3 ms on the full 512^3 spectra step vs the
        # one-pass folded kernel (shellbin_v2_512.json).
        return shell_bin_values_folded_v2(folded[0], folded[1], int(nbins), nx, ny, full_nz)
    if (on_tpu() or FORCE_INTERPRET) and shape[1] % 8 == 0:
        return _build_shell_fn(shape, int(nbins), str(total.dtype), FORCE_INTERPRET, full_nz)(
            total, longi, trans
        )
    return _shell_bin_jnp_rfft(total, longi, trans, nbins, full_nz)


def _fold_quadrants(v: jax.Array) -> jax.Array:
    """Sum the negative-frequency x/y halves onto the positive quadrant.

    (nx, ny, nzr) -> (nx//2+1, pad8(ny//2+1), nzr); padding rows are
    zero. Runs as fused XLA elementwise adds (memory-bound), so the
    expensive per-bin kernel loop sees 1/4 of the cells.
    """
    for axis in (0, 1):
        n = v.shape[axis]
        nh = n // 2 + 1
        top = jax.lax.slice_in_dim(v, 0, nh, axis=axis)
        rest = jnp.flip(jax.lax.slice_in_dim(v, nh, n, axis=axis), axis=axis)
        pad_cfg = [(0, 0, 0)] * v.ndim
        pad_cfg[axis] = (1, nh - 1 - (n - nh), 0)
        v = top + jax.lax.pad(rest, jnp.asarray(0, v.dtype), pad_cfg)
    nyh = v.shape[1]
    ny_pad = (-nyh) % 8
    if ny_pad:
        v = jnp.pad(v, ((0, 0), (0, ny_pad), (0, 0)))
    return v


def _fold_pair_kernel(tp_ref, tm_ref, lp_ref, lm_ref, to_ref, lo_ref, *, full_nx, full_ny, rows_f):
    """One-pass quadrant fold: +-kx via mirror-slab refs, +-ky via an
    exact 0/1 fold-matrix matmul (bf16x3 HIGHEST: products with 0/1 and
    <=2-term f32 accumulation are exact, so the result is bit-identical
    to the XLA slice/flip/pad/add fold).

    Replaces ``_fold_quadrants``'s XLA passes on TPU: the lax.rev
    relayouts there cost ~3 ms per axis at 512^3 (fold marginal 5.9 ms
    measured) while this kernel reads each element once and writes the
    quarter — ~2.5 ms (docs/perf.md round 3).
    """
    i = pl.program_id(0)
    t = tp_ref[0]
    l = lp_ref[0]
    # Self-paired slabs (kx = 0 and, for even nx, the Nyquist slab)
    # must not double-count: the mirror ref points at the same slab.
    if full_nx % 2 == 0:
        self_pair = (i == 0) | (i == full_nx // 2)
    else:
        self_pair = i == 0
    pair = (~self_pair).astype(t.dtype)
    t = t + pair * tm_ref[0]
    l = l + pair * lm_ref[0]

    # Fold matrix F (rows_f, ny): F[j, j] = 1 for j <= ny//2 and
    # F[j, ny - j] += 1 for 1 <= j < ny//2 (+ny/2 parity for odd ny);
    # rows past the quadrant (pad8) stay zero.
    jf = jax.lax.broadcasted_iota(jnp.int32, (rows_f, full_ny), 0)
    jc = jax.lax.broadcasted_iota(jnp.int32, (rows_f, full_ny), 1)
    nyh_last = full_ny // 2
    ident = (jc == jf) & (jf <= nyh_last)
    mirror = (jc == full_ny - jf) & (jf >= 1)
    if full_ny % 2 == 0:
        mirror = mirror & (jf < nyh_last)
    else:
        mirror = mirror & (jf <= nyh_last)
    fmat = (ident.astype(t.dtype) + mirror.astype(t.dtype))
    to_ref[0] = jnp.dot(fmat, t, precision=jax.lax.Precision.HIGHEST)
    lo_ref[0] = jnp.dot(fmat, l, precision=jax.lax.Precision.HIGHEST)


@lru_cache(maxsize=8)
def _build_fold_pair_fn(shape: Tuple[int, int, int], dtype_name: str, interpret: bool):
    nx, ny, nzr = shape
    nxh = nx // 2 + 1
    nyh = ny // 2 + 1
    rows_f = nyh + ((-nyh) % 8)
    dtype = jnp.dtype(dtype_name)
    pos = pl.BlockSpec((1, ny, nzr), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mir = pl.BlockSpec(
        (1, ny, nzr), lambda i: ((nx - i) % nx, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.BlockSpec((1, rows_f, nzr), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kernel = partial(_fold_pair_kernel, full_nx=nx, full_ny=ny, rows_f=rows_f)

    def run(total, longi):
        return pl.pallas_call(
            kernel,
            grid=(nxh,),
            in_specs=[pos, mir, pos, mir],
            out_specs=[out, out],
            out_shape=[
                jax.ShapeDtypeStruct((nxh, rows_f, nzr), dtype),
                jax.ShapeDtypeStruct((nxh, rows_f, nzr), dtype),
            ],
            interpret=interpret,
        )(total, total, longi, longi)

    return jax.jit(run)


def fold_quadrants_pair(total: jax.Array, longi: jax.Array):
    """(folded_total, folded_longi) via the one-pass Pallas fold on
    TPU/interpret; XLA slice/flip/pad fold elsewhere."""
    shape = tuple(int(s) for s in total.shape)
    if (on_tpu() or FORCE_INTERPRET) and shape[0] % 2 == 0 and shape[1] % 2 == 0:
        return _build_fold_pair_fn(shape, str(total.dtype), FORCE_INTERPRET)(total, longi)
    return _fold_quadrants(total), _fold_quadrants(longi)


def _shell_kernel_folded(
    t_ref, l_ref, out_ref, *, nbins, full_nx, full_ny, full_nz, nzr
):
    """Shell binning over the folded non-negative quadrant.

    Cell (i, jy, jz) stands for the mx*my original (kx, ky) partners
    (already SUMMED into the value volumes by _fold_quadrants), each
    carrying the Hermitian kz weight wz; so value sums weight by wz
    alone while counts weight by mx*my*wz.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = t_ref.shape[1]
    jy = jax.lax.broadcasted_iota(jnp.int32, (rows, nzr), 0)
    jz = jax.lax.broadcasted_iota(jnp.int32, (rows, nzr), 1)
    kx = i.astype(jnp.float32)
    k_abs = jnp.sqrt(kx * kx + (jy * jy + jz * jz).astype(jnp.float32))

    shell = jnp.floor(k_abs + 0.5).astype(jnp.int32)
    in_range = (k_abs <= (nbins - 0.5)) & (jy <= full_ny // 2)
    shell = jnp.where(in_range, jnp.minimum(shell, nbins - 1), nbins)

    if full_nz % 2 == 0:
        wz = jnp.where((jz == 0) | (jz == full_nz // 2), 1.0, 2.0)
    else:
        wz = jnp.where(jz == 0, 1.0, 2.0)
    my = jnp.where((jy == 0) | (jy == full_ny // 2), 1.0, 2.0)
    mx = jnp.where((i == 0) | (i == full_nx // 2), 1.0, 2.0)
    w_cnt = (mx * my) * wz

    t = t_ref[0] * wz
    l = l_ref[0] * wz

    width = _bins_width(nbins)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)

    def body(b, acc):
        m = (shell == b).astype(t.dtype)
        partial = jnp.stack([_sum2(w_cnt * m), _sum2(t * m), _sum2(l * m)])
        onehot = (lane == b).astype(acc.dtype)
        return acc + partial[:, None] * onehot

    # |k| >= kx = i, so shells below i are unreachable in this slab.
    b_lo = jnp.minimum(i, nbins)
    acc = jax.lax.fori_loop(b_lo, nbins, body, jnp.zeros((3, width), dtype=out_ref.dtype))
    out_ref[...] += acc


@lru_cache(maxsize=8)
def _build_shell_folded_fn(
    fshape: Tuple[int, int, int],
    nbins: int,
    dtype_name: str,
    interpret: bool,
    full_nx: int,
    full_ny: int,
    full_nz: int,
):
    nxh, rows, nzr = fshape
    dtype = jnp.dtype(dtype_name)
    slab = pl.BlockSpec((1, rows, nzr), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kernel = partial(
        _shell_kernel_folded,
        nbins=nbins,
        full_nx=full_nx,
        full_ny=full_ny,
        full_nz=full_nz,
        nzr=nzr,
    )

    width = _bins_width(nbins)

    def run(total, longi):
        out = pl.pallas_call(
            kernel,
            grid=(nxh,),
            in_specs=[slab, slab],
            out_specs=pl.BlockSpec((3, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, width), dtype),
            interpret=interpret,
        )(total, longi)
        counts = out[0, :nbins]
        t_sum = out[1, :nbins]
        l_sum = out[2, :nbins]
        return counts, jnp.stack([t_sum, l_sum, t_sum - l_sum])

    return jax.jit(run)


def _shell_kernel_folded_v2(
    t_ref, l_ref, out_ref, *, nbins, full_nx, full_ny, full_nz, nzr, rows_c, z_c,
    unroll, z_segments=((0, -1),)
):
    """Row-chunked, unrolled, VALUES-ONLY folded shell binning.

    Three structural wins over ``_shell_kernel_folded`` (measured stage
    cost there: ~34 ms of the 102 ms 512^3 spectra step):

    * 2D grid ``(kx slab, ky row chunk)``: within a chunk the reachable
      shells span only [round(sqrt(kx^2+ky0^2)),
      round(sqrt(kx^2+ky1^2+kzmax^2))] — the mask loop runs ~1.5-2x
      fewer iterations than the per-slab [kx, nbins) bound. Chunking
      via BLOCK SPECS sidesteps the Mosaic crash that killed the
      in-kernel sublane-slice attempt (see _shell_kernel note).
    * ``unroll`` bins per fori_loop step: the per-iteration
      mask->reduce->accumulate dependency chain is the latency floor;
      unrolling gives the scheduler independent chains to overlap.
    * No count accumulation: counts are data-independent, computed once
      per shape via this same kernel on the multiplicity volume
      (``_folded_counts``) and cached — cuts the per-iteration ALU work
      from mask+3mul+3reduce to mask+2mul+2reduce.

    ``z_segments`` (static (start, end) pairs, 128-aligned starts)
    split the z extent INSIDE the program: each segment runs its own
    bound loop over sqrt(kx^2+ky^2+[z0,z1]^2)-reachable shells, so the
    mask-loop work per point shrinks with the segment's kz spread —
    without the extra grid programs that made the z-GRID-chunk variant
    slower (docs/perf.md). The kernel stays mathematically identical:
    segments partition the tile and the accumulator is shared.
    """
    i = pl.program_id(0)
    c = pl.program_id(1)
    zc = pl.program_id(2)

    @pl.when((i == 0) & (c == 0) & (zc == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    f32 = jnp.float32
    row0 = c * rows_c
    zc0 = zc * z_c
    kx = i.astype(f32)
    width = _bins_width(nbins)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    t_full = t_ref[0]
    l_full = l_ref[0]

    acc = jnp.zeros((2, width), dtype=out_ref.dtype)
    for (s0, s1) in z_segments:
        s1 = z_c if s1 < 0 else s1
        slen = s1 - s0
        jy = jax.lax.broadcasted_iota(jnp.int32, (rows_c, slen), 0) + row0
        jz = jax.lax.broadcasted_iota(jnp.int32, (rows_c, slen), 1) + zc0 + s0
        k_abs = jnp.sqrt(kx * kx + (jy * jy + jz * jz).astype(f32))
        shell = jnp.floor(k_abs + 0.5).astype(jnp.int32)
        zvalid = jz <= nzr - 1  # the last z chunk may overrun the array
        in_range = (k_abs <= (nbins - 0.5)) & (jy <= full_ny // 2) & zvalid
        shell = jnp.where(in_range, jnp.minimum(shell, nbins - 1), nbins)

        if full_nz % 2 == 0:
            wz = jnp.where((jz == 0) | (jz == full_nz // 2), 1.0, 2.0)
        else:
            wz = jnp.where(jz == 0, 1.0, 2.0)
        # Overrun lanes hold undefined values (possibly NaN/Inf, which a
        # 0-mask would NOT neutralize) — zero them via select. Segment
        # slices start 128-aligned (Mosaic lane constraint).
        t_seg = jax.lax.slice(t_full, (0, s0), (rows_c, s1))
        l_seg = jax.lax.slice(l_full, (0, s0), (rows_c, s1))
        t = jnp.where(zvalid, t_seg, 0.0) * wz
        l = jnp.where(zvalid, l_seg, 0.0) * wz

        # Reachable-shell bounds for this (slab, chunk, segment): |k| is
        # monotone in each index, so min at (kx, ky0, z0), max at
        # (kx, ky1, kz1).
        ky0 = row0.astype(f32)
        kz0 = f32(zc0 + s0)
        kmin = jnp.sqrt(kx * kx + ky0 * ky0 + kz0 * kz0)
        b_lo = jnp.maximum(jnp.floor(kmin + 0.5).astype(jnp.int32), 0)
        ky1 = jnp.minimum(row0 + rows_c - 1, full_ny // 2).astype(f32)
        kz1 = jnp.minimum(zc0 + s1 - 1, nzr - 1).astype(f32)
        kmax = jnp.sqrt(kx * kx + ky1 * ky1 + kz1 * kz1)
        b_hi = jnp.minimum(jnp.floor(kmax + 0.5).astype(jnp.int32) + 1, nbins)
        # Chunks that are pure fold padding (row0 beyond the ny/2
        # quadrant) or pure z overrun bin nothing: collapse to zero
        # iterations.
        empty = (row0 > full_ny // 2) | (zc0 + s0 > nzr - 1)
        b_hi = jnp.where(empty, b_lo, jnp.maximum(b_hi, b_lo))

        def body(it, acc, b_lo=b_lo, shell=shell, t=t, l=l):
            b0 = b_lo + it * unroll
            for j in range(unroll):
                b = b0 + j
                m = (shell == b).astype(t.dtype)
                partial = jnp.stack([_sum2(t * m), _sum2(l * m)])
                onehot = (lane == b).astype(acc.dtype)
                acc = acc + partial[:, None] * onehot
            return acc

        nit = (b_hi - b_lo + unroll - 1) // unroll
        acc = jax.lax.fori_loop(0, nit, body, acc)
    out_ref[...] += acc


def _shell_kernel_folded_v3(
    t_ref, l_ref, out_ref, *, nbins, full_nx, full_ny, full_nz, nzr, xc, rows_c,
    unroll, z_segments, defer_rows=False, single_channel=False
):
    """x-BLOCKED values-only folded shell binning.

    The v2 kernel is iteration-OVERHEAD-bound, not element-bound: at
    512^3 its 16.7K mask-loop iterations cost ~1.3 us each (scalar
    bookkeeping + vector->scalar reduction latency), ~23 ms total,
    while the masked element work is ~2 ms of VPU throughput. Blocking
    ``xc`` kx slabs per program shares one bound loop across the x
    block: iterations drop ~xc-fold (the reachable-shell union over
    [x0, x0+xc) is barely wider than one slab's) while per-iteration
    element work grows xc-fold — amortizing the fixed overhead into
    vector throughput. In-program 128-aligned z segments then cut the
    masked element work itself (~1.5x at 512^3). Modeled + measured in
    scripts/tpu_zsplit_probe.py / docs/perf.md; x is padded to an xc
    multiple by the builder (padding rows carry zeros and k_abs beyond
    the shell range, so they bin nothing).
    """
    i = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when((i == 0) & (c == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    f32 = jnp.float32
    x0 = i * xc
    row0 = c * rows_c
    width = _bins_width(nbins)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    jx = jax.lax.broadcasted_iota(jnp.int32, (xc, 1, 1), 0) + x0
    kx2 = (jx * jx).astype(f32)

    nchan = 1 if single_channel else 2
    acc = jnp.zeros((nchan, width), dtype=out_ref.dtype)
    for (s0, s1) in z_segments:
        slen = s1 - s0
        jy = jax.lax.broadcasted_iota(jnp.int32, (1, rows_c, slen), 1) + row0
        jz = jax.lax.broadcasted_iota(jnp.int32, (1, rows_c, slen), 2) + s0
        k_abs = jnp.sqrt(kx2 + (jy * jy + jz * jz).astype(f32))
        shell = jnp.floor(k_abs + 0.5).astype(jnp.int32)
        in_range = (k_abs <= (nbins - 0.5)) & (jy <= full_ny // 2)
        shell = jnp.where(in_range, jnp.minimum(shell, nbins - 1), nbins)

        if full_nz % 2 == 0:
            wz = jnp.where((jz == 0) | (jz == full_nz // 2), 1.0, 2.0)
        else:
            wz = jnp.where(jz == 0, 1.0, 2.0)
        t = jax.lax.slice(t_ref[...], (0, 0, s0), (xc, rows_c, s1)) * wz
        # single_channel: callers pass the same array for both refs and
        # only the t channel is computed (scalar power spectra).
        l = None if single_channel else (
            jax.lax.slice(l_ref[...], (0, 0, s0), (xc, rows_c, s1)) * wz
        )

        # Reachable-shell bounds over the whole x block (min corner
        # (x0, ky0, z0), max corner (x1, ky1, z1)).
        ky0 = row0
        ky1 = jnp.minimum(row0 + rows_c - 1, full_ny // 2)
        x1 = x0 + xc - 1
        kmin = jnp.sqrt((x0 * x0 + ky0 * ky0 + s0 * s0).astype(f32))
        b_lo = jnp.maximum(jnp.floor(kmin + 0.5).astype(jnp.int32), 0)
        kmax = jnp.sqrt((x1 * x1 + ky1 * ky1 + (s1 - 1) * (s1 - 1)).astype(f32))
        b_hi = jnp.minimum(jnp.floor(kmax + 0.5).astype(jnp.int32) + 1, nbins)
        # Pure fold-padding row chunks bin nothing.
        b_hi = jnp.where(row0 > full_ny // 2, b_lo, jnp.maximum(b_hi, b_lo))

        chans = (t,) if single_channel else (t, l)
        if defer_rows:
            # v4: accumulate per-ROW lane sums into (rows_c, width)
            # outer-product accumulators — no vector->scalar reduction
            # inside the loop (the v3 bottleneck was that round trip);
            # one sublane reduction per segment closes them out.
            accs = tuple(jnp.zeros((rows_c, width), dtype=out_ref.dtype) for _ in chans)

            def body4(it, carry, b_lo=b_lo, shell=shell, chans=chans):
                b0 = b_lo + it * unroll
                for j in range(unroll):
                    b = b0 + j
                    m = (shell == b).astype(chans[0].dtype)
                    onehot = (lane == b).astype(carry[0].dtype)
                    parts = tuple(
                        jnp.sum(jnp.sum(ch * m, axis=0), axis=-1, keepdims=True)
                        for ch in chans
                    )
                    carry = tuple(a + p * onehot for a, p in zip(carry, parts))
                return carry

            nit = (b_hi - b_lo + unroll - 1) // unroll
            accs = jax.lax.fori_loop(0, nit, body4, accs)
            acc = acc + jnp.concatenate(
                [jnp.sum(a, axis=0, keepdims=True) for a in accs]
            )
        else:
            def body(it, acc, b_lo=b_lo, shell=shell, chans=chans):
                b0 = b_lo + it * unroll
                for j in range(unroll):
                    b = b0 + j
                    m = (shell == b).astype(chans[0].dtype)
                    partial = jnp.stack(
                        [_sum2(jnp.sum(ch * m, axis=0)) for ch in chans]
                    )
                    onehot = (lane == b).astype(acc.dtype)
                    acc = acc + partial[:, None] * onehot
                return acc

            nit = (b_hi - b_lo + unroll - 1) // unroll
            acc = jax.lax.fori_loop(0, nit, body, acc)
    out_ref[...] += acc


@lru_cache(maxsize=8)
def _build_shell_folded_v3_fn(
    fshape: Tuple[int, int, int],
    nbins: int,
    dtype_name: str,
    interpret: bool,
    full_nx: int,
    full_ny: int,
    full_nz: int,
    xc: int = 16,
    z_splits: int = 2,
    defer_rows: bool = False,
    single_channel: bool = False,
):
    nxh, rows_f, nzr = fshape
    rows_c = _pick_row_chunk(rows_f)
    nxb = -(-nxh // xc)  # builder pads x to nxb*xc
    z_segments = _z_segments(nzr, z_splits)
    dtype = jnp.dtype(dtype_name)
    slab = pl.BlockSpec(
        (xc, rows_c, nzr), lambda i, c: (i, c, 0), memory_space=pltpu.VMEM
    )
    kernel = partial(
        _shell_kernel_folded_v3,
        nbins=nbins,
        full_nx=full_nx,
        full_ny=full_ny,
        full_nz=full_nz,
        nzr=nzr,
        xc=xc,
        rows_c=rows_c,
        unroll=4,
        z_segments=z_segments,
        defer_rows=defer_rows,
        single_channel=single_channel,
    )
    width = _bins_width(nbins)
    x_pad = nxb * xc - nxh
    nchan = 1 if single_channel else 2

    def run(total, longi):
        total, longi = _pad_x([total, longi], x_pad)
        out = pl.pallas_call(
            kernel,
            grid=(nxb, rows_f // rows_c),
            in_specs=[slab, slab],
            out_specs=pl.BlockSpec((nchan, width), lambda i, c: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nchan, width), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(total, longi)
        if single_channel:
            return out[0, :nbins], out[0, :nbins]
        return out[0, :nbins], out[1, :nbins]

    return jax.jit(run)


def _pick_row_chunk(rows_f: int) -> int:
    """SMALLEST multiple-of-8 divisor >= 32 (full rows if none): small
    chunks tighten the per-chunk shell bounds, but below ~32 rows the
    per-program prologue outweighs the loop saving (z-chunk experiment,
    docs/perf.md)."""
    for d in range(32, rows_f + 1, 8):
        if rows_f % d == 0:
            return d
    return rows_f


@lru_cache(maxsize=8)
def _build_shell_folded_v2_fn(
    fshape: Tuple[int, int, int],
    nbins: int,
    dtype_name: str,
    interpret: bool,
    full_nx: int,
    full_ny: int,
    full_nz: int,
    z_splits: int = 0,
):
    nxh, rows_f, nzr = fshape
    rows_c = _pick_row_chunk(rows_f)
    # Lane (z) chunking tightens b_hi by the z extent but measured
    # SLOWER at 512^3 (100.6 vs 96.3 ms spectra): 3x the programs and
    # 1/2-size blocks cost more in per-program prologue than the 1.6x
    # fewer mask-loop ops save. Single z chunk; the masking/overrun
    # machinery stays for any future shape that wants chunking.
    # IN-PROGRAM z segments recover the bound tightening without extra
    # programs (see _shell_kernel_folded_v2 docstring); Z_SPLITS_DEFAULT
    # holds the measured-best split count.
    z_c = nzr
    n_zc = -(-nzr // z_c)
    z_segments = _z_segments(z_c, z_splits or Z_SPLITS_DEFAULT)
    dtype = jnp.dtype(dtype_name)
    slab = pl.BlockSpec(
        (1, rows_c, z_c), lambda i, c, z: (i, c, z), memory_space=pltpu.VMEM
    )
    kernel = partial(
        _shell_kernel_folded_v2,
        nbins=nbins,
        full_nx=full_nx,
        full_ny=full_ny,
        full_nz=full_nz,
        nzr=nzr,
        rows_c=rows_c,
        z_c=z_c,
        unroll=4,
        z_segments=z_segments,
    )
    width = _bins_width(nbins)

    def run(total, longi):
        out = pl.pallas_call(
            kernel,
            grid=(nxh, rows_f // rows_c, n_zc),
            in_specs=[slab, slab],
            out_specs=pl.BlockSpec(
                (2, width), lambda i, c, z: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((2, width), dtype),
            interpret=interpret,
        )(total, longi)
        return out[0, :nbins], out[1, :nbins]

    return jax.jit(run)


@lru_cache(maxsize=8)
def _folded_counts(
    fshape: Tuple[int, int, int],
    nbins: int,
    dtype_name: str,
    full_nx: int,
    full_ny: int,
    full_nz: int,
):
    """Per-shell unfold-multiplicity counts — a pure shape function.

    Computed ONCE per shape in host NumPy (eager — safe to call from
    inside a jit trace, where a device computation would cache a
    tracer) and embedded as a constant. Weighting mx*my*wz matches the
    one-pass kernel's w_cnt exactly; integer weights sum exactly in
    f32 (largest 512^3 shell ~8e5 << 2^24).
    """
    nxh, _rows_f, nzr = fshape
    nyh = full_ny // 2 + 1
    ix = np.arange(nxh, dtype=np.float32)
    jy = np.arange(nyh, dtype=np.float32)
    jz = np.arange(nzr, dtype=np.float32)
    # Self-conjugate classes carry multiplicity 1: always |k|=0, plus
    # the Nyquist row ONLY for even extents (odd extents have none —
    # without the parity guard, odd-nx/ny counts undercount every
    # interior shell; rfft_shell_counts reaches this with odd shapes).
    if full_nx % 2 == 0:
        mx = np.where((ix == 0) | (ix == full_nx // 2), 1.0, 2.0).astype(np.float32)
    else:
        mx = np.where(ix == 0, 1.0, 2.0).astype(np.float32)
    if full_ny % 2 == 0:
        my = np.where((jy == 0) | (jy == full_ny // 2), 1.0, 2.0).astype(np.float32)
    else:
        my = np.where(jy == 0, 1.0, 2.0).astype(np.float32)
    if full_nz % 2 == 0:
        wz = np.where((jz == 0) | (jz == full_nz // 2), 1.0, 2.0).astype(np.float32)
    else:
        wz = np.where(jz == 0, 1.0, 2.0).astype(np.float32)
    k2 = ix[:, None, None] ** 2 + jy[None, :, None] ** 2 + jz[None, None, :] ** 2
    k_abs = np.sqrt(k2, out=k2)
    shell = np.floor(k_abs + 0.5).astype(np.int64)
    in_range = k_abs <= (nbins - 0.5)
    shell = np.where(in_range, np.minimum(shell, nbins - 1), nbins)
    w = (mx[:, None, None] * my[None, :, None]) * wz[None, None, :]
    counts = np.bincount(shell.ravel(), weights=w.ravel(), minlength=nbins + 1)[:nbins]
    # Return HOST numpy: a jnp array materialized under an active jit
    # trace is a tracer, and caching it leaks it into later traces.
    # Callers lift it per-trace.
    return counts.astype(dtype_name)


def shell_bin_values_folded_v2(total: jax.Array, longi: jax.Array, nbins: int,
                               full_nx: int, full_ny: int, full_nz: int):
    """(counts, sums[3]) from FOLDED quadrant power volumes via the
    x-blocked values-only kernel (v3) + cached static counts.

    v3 (x-blocked) measured 87.4 ms on the 512^3 spectra path vs
    95.0 ms for the row-chunk-only v2 (zsplit_512.json): the v2 kernel
    was iteration-OVERHEAD-bound, and blocking kx slabs per program
    amortizes the ~1.3 us/iteration fixed cost. v4 (defer_rows) also
    removes the per-bin vector->scalar reduction round trip by
    accumulating per-row lane sums into (rows, width) outer-product
    accumulators: xc=16 + 2 z segments measured 84.4 vs 86.7 ms
    (v4bin_512.json) — the production configuration.
    """
    fshape = tuple(int(s) for s in total.shape)
    dname = str(total.dtype)
    t_sum, l_sum = _build_shell_folded_v3_fn(
        fshape, int(nbins), dname, FORCE_INTERPRET, full_nx, full_ny, full_nz, 16, 2, True
    )(total, longi)
    counts = jnp.asarray(_folded_counts(fshape, int(nbins), dname, full_nx, full_ny, full_nz))
    return counts, jnp.stack([t_sum, l_sum, t_sum - l_sum])


def shell_bin_sums_rfft_scalar(p: jax.Array, nbins: int, full_nz: int):
    """(counts, sums) Hermitian-weighted shell binning of ONE power
    volume (scalar spectra): the single-channel v3/v4 kernel skips the
    second channel's mask/multiply/reduce work that binning a scalar
    through the two-channel interface would waste."""
    shape = tuple(int(s) for s in p.shape)
    nx, ny, nzr = shape
    if (on_tpu() or FORCE_INTERPRET) and nx % 2 == 0 and ny % 2 == 0:
        folded, _ = fold_quadrants_pair(p, p)
        fshape = tuple(int(s) for s in folded.shape)
        dname = str(folded.dtype)
        t_sum, _ = _build_shell_folded_v3_fn(
            fshape, int(nbins), dname, FORCE_INTERPRET, nx, ny, full_nz, 16, 2, True, True
        )(folded, folded)
        counts = jnp.asarray(_folded_counts(fshape, int(nbins), dname, nx, ny, full_nz))
        return counts, t_sum
    counts, sums = _shell_bin_jnp_rfft(p, p, p, nbins, full_nz)
    return counts, sums[0]


def _shell_kernel_chunkx(
    kx0_ref, t_ref, l_ref, out_ref, *, full_nx, full_ny, gy, nbins, full_nz, nzr,
    rows_x, xc, z_segments, with_counts=True,
):
    """rfft shell binning of an x-chunk of k-space (rows kx0..kx0+rows).

    Used by the out-of-core 1024^3 path, where the x-axis DFT is
    applied in chunks and each chunk is binned as it is produced, and
    by the pod shard_map spectra (on the transposed local y-slab).
    ``kx0`` arrives via scalar prefetch so one compiled kernel serves
    every chunk. The ky axis is tiled (``gy`` rows per step): full-ny
    blocks at 1024^3 blow the 16 MB scoped-VMEM stack with the kernel's
    full-size temporaries.

    x-BLOCKED like _shell_kernel_folded_v3: ``xc`` kx rows share one
    bound loop (the kernel is iteration-overhead-bound, ~1.3 us fixed
    per mask-loop iteration — see the v3 docstring), with 128-aligned
    in-program ``z_segments`` cutting the masked element work. Rows
    beyond ``rows_x`` (x padding to an xc multiple) are masked out of
    range.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    f32 = jnp.float32
    r0 = i * xc  # first chunk-local row of this block
    jx_loc = jax.lax.broadcasted_iota(jnp.int32, (xc, 1, 1), 0)
    jxg = jx_loc + r0 + kx0_ref[0]
    kx = jnp.where(jxg <= (full_nx - 1) // 2, jxg, jxg - full_nx).astype(f32)
    kx2 = kx * kx
    row_valid = (jx_loc + r0) < rows_x

    width = _bins_width(nbins)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    nrows = 3 if with_counts else 2

    # |kx| extrema over the block's VALID rows (|kx| as a function of
    # jxg rises to full_nx//2 then falls, so min is at an endpoint and
    # max is the peak if covered, else an endpoint).
    e0 = r0 + kx0_ref[0]
    e1 = jnp.minimum(r0 + xc - 1, rows_x - 1) + kx0_ref[0]
    a0 = jnp.minimum(e0, full_nx - e0)
    a1 = jnp.minimum(e1, full_nx - e1)
    akx_min = jnp.minimum(a0, a1).astype(f32)
    x_has_peak = (e0 <= full_nx // 2) & (full_nx // 2 <= e1)
    akx_max = jnp.where(x_has_peak, full_nx // 2, jnp.maximum(a0, a1)).astype(f32)

    # |ky| extrema over the y tile (same unimodal argument).
    y0 = j * gy
    y1 = y0 + gy - 1
    aky0 = jnp.minimum(y0, full_ny - y0)
    aky1 = jnp.minimum(y1, full_ny - y1)
    ky_min = jnp.minimum(aky0, aky1).astype(f32)
    has_peak = (y0 <= full_ny // 2) & (full_ny // 2 <= y1)
    ky_max = jnp.where(has_peak, full_ny // 2, jnp.maximum(aky0, aky1)).astype(f32)

    jy2 = j * gy + jax.lax.broadcasted_iota(jnp.int32, (1, gy, 1), 1)
    ky = jnp.where(jy2 <= (full_ny - 1) // 2, jy2, jy2 - full_ny).astype(f32)
    ky2 = ky * ky

    acc = jnp.zeros((nrows, width), dtype=out_ref.dtype)
    for (s0, s1) in z_segments:
        slen = s1 - s0
        jz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, slen), 2) + s0
        kzf = jz.astype(f32)
        if full_nz % 2 == 0:
            weight = jnp.where((jz == 0) | (jz == full_nz // 2), 1.0, 2.0)
        else:
            weight = jnp.where(jz == 0, 1.0, 2.0)

        k_abs = jnp.sqrt(kx2 + ky2 + kzf * kzf)
        shell = jnp.floor(k_abs + 0.5).astype(jnp.int32)
        valid = (k_abs <= (nbins - 0.5)) & row_valid
        shell = jnp.where(valid, jnp.minimum(shell, nbins - 1), nbins)

        t = jax.lax.slice(t_ref[...], (0, 0, s0), (xc, gy, s1)) * weight
        l = jax.lax.slice(l_ref[...], (0, 0, s0), (xc, gy, s1)) * weight
        wc = weight  # counts weight, broadcast against the mask

        kmin = jnp.sqrt(akx_min * akx_min + ky_min * ky_min + f32(s0) * s0)
        kmax = jnp.sqrt(akx_max * akx_max + ky_max * ky_max + f32(s1 - 1) * (s1 - 1))
        b_lo = jnp.maximum(jnp.floor(kmin + 0.5).astype(jnp.int32), 0)
        b_hi = jnp.minimum(jnp.floor(kmax + 0.5).astype(jnp.int32) + 1, nbins)
        b_hi = jnp.maximum(b_hi, b_lo)

        unroll = 4

        if with_counts:
            # Deferred-row accumulation (the v4 scheme, see
            # _shell_kernel_folded_v3): per-row lane sums land in
            # (gy, width) outer-product accumulators — no
            # vector->scalar reduction round trip inside the loop.
            # Measured faster only for the 3-channel counts variant
            # (19.4 -> 15.7 ms device; the 2-channel values-only path
            # measured ~1.7 ms SLOWER with it — chunkbin_512_v4*.json).
            accs = tuple(jnp.zeros((gy, width), dtype=out_ref.dtype) for _ in range(nrows))

            def body4(it, carry, b_lo=b_lo, shell=shell, t=t, l=l, wc=wc):
                b0 = b_lo + it * unroll
                for u in range(unroll):
                    b = b0 + u
                    m = (shell == b).astype(t.dtype)
                    onehot = (lane == b).astype(out_ref.dtype)
                    cm = jnp.sum(jnp.sum(wc * m, axis=0), axis=-1, keepdims=True)
                    tm = jnp.sum(jnp.sum(t * m, axis=0), axis=-1, keepdims=True)
                    lm = jnp.sum(jnp.sum(l * m, axis=0), axis=-1, keepdims=True)
                    carry = tuple(a + p * onehot for a, p in zip(carry, (cm, tm, lm)))
                return carry

            nit = (b_hi - b_lo + unroll - 1) // unroll
            accs = jax.lax.fori_loop(0, nit, body4, accs)
            acc = acc + jnp.concatenate(
                [jnp.sum(a, axis=0, keepdims=True) for a in accs]
            )
        else:
            def body(it, acc, b_lo=b_lo, shell=shell, t=t, l=l):
                b0 = b_lo + it * unroll
                for u in range(unroll):
                    b = b0 + u
                    m = (shell == b).astype(t.dtype)
                    # Counts are a pure shape function (chunks/shards
                    # sum to the same totals _folded_counts precomputes)
                    # — skip the count accumulation entirely.
                    tm = jnp.sum(t * m, axis=0)
                    lm = jnp.sum(l * m, axis=0)
                    partial = jnp.stack([_sum2(tm), _sum2(lm)])
                    onehot = (lane == b).astype(acc.dtype)
                    acc = acc + partial[:, None] * onehot
                return acc

            nit = (b_hi - b_lo + unroll - 1) // unroll
            acc = jax.lax.fori_loop(0, nit, body, acc)
    out_ref[...] += acc


def _pick_gy(ny: int) -> int:
    """ky tile: largest multiple-of-8 divisor of ny up to 128."""
    gy = 0
    for cand in (128, 64, 32, 16, 8):
        if ny % cand == 0:
            return cand
    return ny if ny % 8 == 0 or ny < 8 else 0


@lru_cache(maxsize=8)
def _build_shell_chunk_fn(
    chunk_shape: Tuple[int, int, int],
    nbins: int,
    dtype_name: str,
    interpret: bool,
    full_nx: int,
    full_nz: int,
    with_counts: bool = True,
):
    rows_x, ny, nzr = chunk_shape
    gy = _pick_gy(ny)
    # x block: amortize the per-iteration fixed cost (v3 rationale);
    # small chunks keep one block.
    xc = 32 if rows_x >= 32 else (8 if rows_x >= 8 else rows_x)
    nxb = -(-rows_x // xc)
    z_segments = _z_segments(nzr, 2)
    dtype = jnp.dtype(dtype_name)
    slab = pl.BlockSpec((xc, gy, nzr), lambda i, j, s: (i, j, 0), memory_space=pltpu.VMEM)
    kernel = partial(
        _shell_kernel_chunkx,
        full_nx=full_nx,
        full_ny=ny,
        gy=gy,
        nbins=nbins,
        full_nz=full_nz,
        nzr=nzr,
        rows_x=rows_x,
        xc=xc,
        z_segments=z_segments,
        with_counts=with_counts,
    )
    width = _bins_width(nbins)
    nrows = 3 if with_counts else 2
    x_pad = nxb * xc - rows_x

    def run(kx0, total, longi):
        total, longi = _pad_x([total, longi], x_pad)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nxb, ny // gy),
            in_specs=[slab, slab],
            out_specs=pl.BlockSpec((nrows, width), lambda i, j, s: (0, 0), memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nrows, width), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(kx0, total, longi)
        if with_counts:
            counts = out[0, :nbins]
            t_sum = out[1, :nbins]
            l_sum = out[2, :nbins]
            return counts, jnp.stack([t_sum, l_sum, t_sum - l_sum])
        t_sum = out[0, :nbins]
        l_sum = out[1, :nbins]
        return jnp.stack([t_sum, l_sum, t_sum - l_sum])

    return jax.jit(run)


def rfft_shell_counts(full_shape: Tuple[int, int, int], nbins: int, dtype_name: str):
    """Static full-volume rfft Hermitian shell counts (host numpy).

    Exactly what the chunk/shard count accumulators sum to: counts are
    a pure shape function, so values-only kernels skip them and
    consumers use this instead (same table as the folded-kernel path).
    """
    nx, ny, nz = (int(s) for s in full_shape)
    fshape = (nx // 2 + 1, 0, nz // 2 + 1)  # rows_f unused by _folded_counts
    return _folded_counts(fshape, int(nbins), dtype_name, nx, ny, nz)


def shell_bin_values_rfft_chunk(
    total: jax.Array,
    longi: jax.Array,
    nbins: int,
    full_nx: int,
    full_nz: int,
    kx0,
):
    """sums[3] of an x-chunk of rfft powers — values only; pair with
    ``rfft_shell_counts`` for the (static) counts."""
    shape = tuple(int(s) for s in total.shape)
    if (on_tpu() or FORCE_INTERPRET) and _pick_gy(shape[1]):
        kx0_arr = jnp.asarray([kx0], dtype=jnp.int32)
        return _build_shell_chunk_fn(
            shape, int(nbins), str(total.dtype), FORCE_INTERPRET, full_nx, full_nz,
            with_counts=False,
        )(kx0_arr, total, longi)
    _, sums = _shell_bin_jnp_rfft_chunk(
        total, longi, total - longi, nbins, full_nx, full_nz, kx0
    )
    return sums


def _powers_fold_bin_kernel(
    rp_ref, ip_ref, rm_ref, im_ref, out_ref, *, nbins, full_nx, full_ny, full_nz, nzr, rows_f
):
    """Fused spectral powers + quadrant fold + shell binning.

    Program i covers the +-kx slab PAIR (jx = i and jx = full_nx - i):
    the mirror slab arrives via a second set of refs on the same
    stacked-planar transform arrays (index map (full_nx - i) % full_nx),
    so the x fold needs no in-kernel reversal. The y fold is one
    anti-diagonal 0/1 matmul (exact at HIGHEST): fold[j] = t[j] +
    (P @ t)[j] with P[j, full_ny - j] = 1 for 1 <= j < full_ny/2.
    Counts weight by the unfold multiplicities mx*my*wz exactly like
    _shell_kernel_folded.
    """
    i = pl.program_id(0)
    f32 = jnp.float32

    rp = rp_ref[:, 0]  # (3, ny, nzr) planar re/im, primary slab
    ip = ip_ref[:, 0]
    rm = rm_ref[:, 0]  # mirror slab (jx = full_nx - i)
    imm = im_ref[:, 0]

    jy = jax.lax.broadcasted_iota(jnp.int32, (full_ny, nzr), 0)
    jz = jax.lax.broadcasted_iota(jnp.int32, (full_ny, nzr), 1)
    ky_full = jnp.where(jy <= (full_ny - 1) // 2, jy, jy - full_ny).astype(f32)
    kz_full = jz.astype(f32)

    # Conjugate-even / Nyquist splits per axis (see rfft_power_volumes).
    ky_r = jnp.where(jy == full_ny // 2, 0.0, ky_full)
    ky_n = jnp.where(jy == full_ny // 2, full_ny / 2.0, 0.0)
    if full_nz % 2 == 0:
        kz_r = jnp.where(jz == full_nz // 2, 0.0, kz_full)
        kz_n = jnp.where(jz == full_nz // 2, full_nz / 2.0, 0.0)
    else:
        kz_r, kz_n = kz_full, jnp.zeros_like(kz_full)
    ifl = i.astype(f32)
    kxp_r = jnp.where(i == full_nx // 2, 0.0, ifl)
    kxp_n = jnp.where(i == full_nx // 2, full_nx / 2.0, 0.0)

    k2 = ifl * ifl + ky_full * ky_full + kz_full * kz_full
    g2 = jnp.maximum(k2, 1e-30)
    at_kz0 = jz == 0

    def powers(r3, i3, kx_r, kx_n):
        tot = 0.5 * jnp.sum(r3 * r3 + i3 * i3, axis=0)
        reg_re = kx_r * r3[0] + ky_r * r3[1] + kz_r * r3[2]
        reg_im = kx_r * i3[0] + ky_r * i3[1] + kz_r * i3[2]
        nyq_re = kx_n * r3[0] + ky_n * r3[1] + kz_n * r3[2]
        nyq_im = kx_n * i3[0] + ky_n * i3[1] + kz_n * i3[2]
        lon = (
            jnp.where(
                at_kz0,
                (reg_re - nyq_re) ** 2 + (reg_im - nyq_im) ** 2,
                reg_re**2 + reg_im**2 + nyq_re**2 + nyq_im**2,
            )
            / g2
        )
        return tot, lon

    t, l = powers(rp, ip, kxp_r, kxp_n)
    # Mirror slab: kx = -i, never a Nyquist row for 0 < i < nx/2; the
    # pair weight masks i == 0 and i == nx/2 (self-paired slabs).
    pair = ((i > 0) & (i < full_nx // 2)).astype(f32)
    t_m, l_m = powers(rm, imm, -ifl, jnp.zeros_like(ky_n[:1, :1]) + 0.0)
    t = t + pair * t_m
    l = l + pair * l_m

    # --- y fold: anti-diagonal matmul, exact 0/1 matrix ---------------
    jf = jax.lax.broadcasted_iota(jnp.int32, (rows_f, full_ny), 0)
    jc = jax.lax.broadcasted_iota(jnp.int32, (rows_f, full_ny), 1)
    pmat = ((jc == full_ny - jf) & (jf >= 1) & (jf < full_ny // 2)).astype(t.dtype)
    tf = t[:rows_f] + jnp.dot(pmat, t, precision=jax.lax.Precision.HIGHEST)
    lf = l[:rows_f] + jnp.dot(pmat, l, precision=jax.lax.Precision.HIGHEST)

    # --- shell binning of the folded quadrant (cf. _shell_kernel_folded)
    jyf = jax.lax.broadcasted_iota(jnp.int32, (rows_f, nzr), 0)
    jzf = jax.lax.broadcasted_iota(jnp.int32, (rows_f, nzr), 1)
    k_abs = jnp.sqrt(ifl * ifl + (jyf * jyf + jzf * jzf).astype(f32))
    shell = jnp.floor(k_abs + 0.5).astype(jnp.int32)
    in_range = (k_abs <= (nbins - 0.5)) & (jyf <= full_ny // 2)
    shell = jnp.where(in_range, jnp.minimum(shell, nbins - 1), nbins)

    if full_nz % 2 == 0:
        wz = jnp.where((jzf == 0) | (jzf == full_nz // 2), 1.0, 2.0)
    else:
        wz = jnp.where(jzf == 0, 1.0, 2.0)
    my = jnp.where((jyf == 0) | (jyf == full_ny // 2), 1.0, 2.0)
    mx = jnp.where((i == 0) | (i == full_nx // 2), 1.0, 2.0)
    w_cnt = (mx * my) * wz

    tw = tf * wz
    lw = lf * wz

    width = _bins_width(nbins)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)

    def body(b, acc):
        m = (shell == b).astype(tw.dtype)
        partial = jnp.stack([_sum2(w_cnt * m), _sum2(tw * m), _sum2(lw * m)])
        onehot = (lane == b).astype(acc.dtype)
        return acc + partial[:, None] * onehot

    b_lo = jnp.minimum(i, nbins)
    acc = jax.lax.fori_loop(b_lo, nbins, body, jnp.zeros((3, width), dtype=out_ref.dtype))

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += acc


@lru_cache(maxsize=8)
def _build_powers_fold_bin_fn(
    shape: Tuple[int, int, int], nbins: int, dtype_name: str, interpret: bool
):
    nx, ny, nz = shape
    nzr = nz // 2 + 1
    nxh = nx // 2 + 1
    nyh = ny // 2 + 1
    rows_f = nyh + ((-nyh) % 8)
    dtype = jnp.dtype(dtype_name)

    prim = pl.BlockSpec((3, 1, ny, nzr), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM)
    mirr = pl.BlockSpec(
        (3, 1, ny, nzr), lambda i: (0, (nx - i) % nx, 0, 0), memory_space=pltpu.VMEM
    )
    width = _bins_width(nbins)
    kernel = partial(
        _powers_fold_bin_kernel,
        nbins=nbins,
        full_nx=nx,
        full_ny=ny,
        full_nz=nz,
        nzr=nzr,
        rows_f=rows_f,
    )

    def run(re_stack, im_stack):
        out = pl.pallas_call(
            kernel,
            grid=(nxh,),
            in_specs=[prim, prim, mirr, mirr],
            out_specs=pl.BlockSpec((3, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, width), dtype),
            # 4 slab refs (double-buffered) + temps exceed the 16 MB
            # default scoped-VMEM budget at 512^3; v5e has 128 MB VMEM.
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(re_stack, im_stack, re_stack, im_stack)
        counts = out[0, :nbins]
        t_sum = out[1, :nbins]
        l_sum = out[2, :nbins]
        return counts, jnp.stack([t_sum, l_sum, t_sum - l_sum])

    return jax.jit(run)


def shell_bin_powers_fused(re_stack: jax.Array, im_stack: jax.Array, nbins: int, full_nz: int):
    """(counts, sums[3]) straight from stacked planar rfft transforms.

    ``re_stack``/``im_stack`` are (3, nx, ny, nz//2+1) from
    ``experiments.planar_dft.rfftn_mxu_planar_stacked`` (already 1/ntot-normalized). Fuses
    the power computation, the +-kx pair fold (mirror-slab refs), the
    +-ky fold (anti-diagonal matmul) and the Hermitian-weighted shell
    binning into ONE kernel pass over the transforms — the power
    volumes are never materialized. Even x/y extents only.
    """
    three, nx, ny, nzr = (int(s) for s in re_stack.shape)
    if not ((on_tpu() or FORCE_INTERPRET) and nx % 2 == 0 and ny % 2 == 0):
        raise ValueError("fused powers binning: TPU/interpret with even x/y extents only")
    return _build_powers_fold_bin_fn(
        (nx, ny, int(full_nz)), int(nbins), str(re_stack.dtype), FORCE_INTERPRET
    )(re_stack, im_stack)


def shell_bin_sums_rfft_chunk(
    total: jax.Array,
    longi: jax.Array,
    trans: jax.Array,
    nbins: int,
    full_nx: int,
    full_nz: int,
    kx0,
):
    """Hermitian-weighted shell binning of an x-chunk of rfft powers.

    ``kx0`` (traced int) is the chunk's first global x index. Sums over
    all chunks equal the full-volume shell binning.
    """
    shape = tuple(int(s) for s in total.shape)
    if (on_tpu() or FORCE_INTERPRET) and _pick_gy(shape[1]):
        kx0_arr = jnp.asarray([kx0], dtype=jnp.int32)
        return _build_shell_chunk_fn(
            shape, int(nbins), str(total.dtype), FORCE_INTERPRET, full_nx, full_nz
        )(kx0_arr, total, longi)
    return _shell_bin_jnp_rfft_chunk(total, longi, trans, nbins, full_nx, full_nz, kx0)


@partial(jax.jit, static_argnames=("nbins", "full_nx", "full_nz"))
def _shell_bin_jnp_rfft_chunk(total, longi, trans, nbins, full_nx, full_nz, kx0):
    rows_x, ny, nzr = total.shape
    jxg = kx0 + jnp.arange(rows_x)
    kx = jnp.where(jxg <= (full_nx - 1) // 2, jxg, jxg - full_nx).astype(total.dtype)
    ky = jnp.arange(ny)
    ky = jnp.where(ky <= (ny - 1) // 2, ky, ky - ny).astype(total.dtype)
    kz = jnp.arange(nzr).astype(total.dtype)
    k_abs = jnp.sqrt(
        kx[:, None, None] ** 2 + ky[None, :, None] ** 2 + kz[None, None, :] ** 2
    )
    self_conj = jnp.arange(nzr) == 0
    if full_nz % 2 == 0:
        self_conj = self_conj | (jnp.arange(nzr) == full_nz // 2)
    weight = jnp.where(self_conj, 1.0, 2.0)
    weight = jnp.broadcast_to(weight[None, None, :], total.shape).astype(total.dtype)

    idx = jnp.clip(jnp.floor(k_abs + 0.5).astype(jnp.int32), 0, nbins - 1).ravel()
    mask = (k_abs <= (nbins - 0.5)).ravel()
    w = jnp.where(mask, weight.ravel(), 0)
    counts = jnp.zeros(nbins, dtype=total.dtype).at[idx].add(w)
    stacked = jnp.stack([total.ravel(), longi.ravel(), trans.ravel()])
    sums = jnp.zeros((3, nbins), dtype=total.dtype).at[:, idx].add(stacked * w)
    return counts, sums


@partial(jax.jit, static_argnames=("nbins", "full_nz"))
def _shell_bin_jnp_rfft(total, longi, trans, nbins, full_nz):
    shape = total.shape
    nx, ny, nzr = shape
    k2 = jnp.zeros(shape, dtype=total.dtype)
    for axis, n in ((0, nx), (1, ny)):
        k = jnp.arange(n)
        k = jnp.where(k <= (n - 1) // 2, k, k - n).astype(total.dtype)
        kshape = [1, 1, 1]
        kshape[axis] = n
        k2 = k2 + k.reshape(kshape) ** 2
    kz = jnp.arange(nzr).astype(total.dtype)
    k2 = k2 + kz.reshape(1, 1, nzr) ** 2
    k_abs = jnp.sqrt(k2)
    self_conj = jnp.arange(nzr) == 0
    if full_nz % 2 == 0:  # Nyquist plane exists only for even extents
        self_conj = self_conj | (jnp.arange(nzr) == full_nz // 2)
    weight = jnp.where(self_conj, 1.0, 2.0)
    weight = jnp.broadcast_to(weight.reshape(1, 1, nzr), shape).astype(total.dtype)

    idx = jnp.clip(jnp.floor(k_abs + 0.5).astype(jnp.int32), 0, nbins - 1).ravel()
    mask = (k_abs <= (nbins - 0.5)).ravel()
    w = weight.ravel()
    counts = jnp.zeros(nbins, dtype=total.dtype).at[idx].add(jnp.where(mask, w, 0))
    stacked = jnp.stack([total.ravel(), longi.ravel(), trans.ravel()]) * w
    sums = jnp.zeros((3, nbins), dtype=total.dtype).at[:, idx].add(jnp.where(mask, stacked, 0))
    return counts, sums


@partial(jax.jit, static_argnames=("nbins",))
def _shell_bin_jnp(total, longi, trans, nbins):
    shape = total.shape
    nd = len(shape)
    k2 = jnp.zeros(shape, dtype=total.dtype)
    for axis, n in enumerate(shape):
        k = jnp.arange(n)
        k = jnp.where(k <= (n - 1) // 2, k, k - n).astype(total.dtype)
        kshape = [1] * nd
        kshape[axis] = n
        k2 = k2 + k.reshape(kshape) ** 2
    k_abs = jnp.sqrt(k2)
    idx = jnp.clip(jnp.floor(k_abs + 0.5).astype(jnp.int32), 0, nbins - 1).ravel()
    mask = (k_abs <= (nbins - 0.5)).ravel()
    counts = jnp.zeros(nbins, dtype=total.dtype).at[idx].add(mask.astype(total.dtype))
    stacked = jnp.stack([total.ravel(), longi.ravel(), trans.ravel()])
    sums = jnp.zeros((3, nbins), dtype=total.dtype).at[:, idx].add(jnp.where(mask, stacked, 0))
    return counts, sums
