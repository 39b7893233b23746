"""Pallas AMR->uniform regrid kernel (tile DMA + matrix prolongation).

The generic regrid is one flat gather (ops/regrid.py), but TPU gathers
stream ~100M random elements/s — far below HBM bandwidth. This kernel
exploits the regrid's structure instead. Every output *tile* (one
fine-block footprint, (ncx, ncy, ncz) cells) comes from one source
block: a sub-box selected at a per-tile offset and replicated by a
power-of-two factor 2^L per axis (injection prolongation).

TPU lane-tiling constraints forbid slicing or reshaping any sub-128
lane dimension, so the kernel works in a combined layout:

 * field data enters as (nblocks, ncx, ncy*ncz) — lane = ncy*ncz >= 128
 * per tile, the full source block is DMA'd into VMEM (consecutive
   tiles reuse the resident block via an SMEM block-id cache)
 * the x-axis select+expand is ncx unrolled row reads at traced
   offsets (the leading memref dim is untiled)
 * the (y,z) select+expand is ONE matmul with a dynamically built
   Kronecker 0/1 matrix M[(iy,iz),(jy,jz)] = My[iy,jy]*Mz[iz,jz] —
   static shapes for any refinement level
 * output is written tile-major (ntiles, ncx, ncy*ncz) — full aligned
   blocks, no dynamic offsets; XLA re-lays it out into the volume.

Applicable when block cell counts are powers of two, ncy*ncz >= 128,
and 2^(lmax-level) <= ncells (the rtflame regime); otherwise callers
fall back to the gather path.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fava_tpu.ops import pallas_kernels as _pk
from fava_tpu.ops.pallas_kernels import on_tpu


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def regrid_tiles_supported(ncells: Tuple[int, int, int], max_scale: int) -> bool:
    ncx, ncy, ncz = (int(c) for c in ncells)
    return (
        (on_tpu() or _pk.FORCE_INTERPRET)
        and all(_is_pow2(c) for c in (ncx, ncy, ncz))
        and max_scale <= min(ncx, ncy, ncz)
        and ncy * ncz >= 128
        and ncx >= 8
    )


def _kron_select_matrix(ky, kz, lvl, ncy: int, ncz: int, dtype):
    """(ncy*ncz, ncy*ncz) 0/1 matrix fusing (y,z) sub-box selection and
    2^lvl injection expansion: M[(iy,iz),(jy,jz)] = 1 iff
    iy == ky*(ncy>>lvl) + (jy>>lvl) and iz == kz*(ncz>>lvl) + (jz>>lvl)."""
    n = ncy * ncz
    lvl32 = lvl.astype(jnp.int32)
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    iy, iz = r // ncz, r % ncz
    jy, jz = c // ncz, c % ncz

    def shift(v):
        return jax.lax.shift_right_logical(v, lvl32)

    want_y = ky.astype(jnp.int32) * shift(jnp.int32(ncy)) + shift(jy)
    want_z = kz.astype(jnp.int32) * shift(jnp.int32(ncz)) + shift(jz)
    return ((iy == want_y) & (iz == want_z)).astype(dtype)


def _regrid_kernel(
    scalars_ref,  # (5, nTiles) int32: [blk, kx, ky, kz, L]; blk < 0 => fill 0
    data_ref,  # ANY/HBM (nB, ncx, ncy*ncz)
    out_ref,  # VMEM (1, ncx, ncy*ncz) — this tile's output block
    block_ref,  # VMEM (ncx, ncy*ncz) resident source block
    prev_ref,  # SMEM (1,) int32: block id currently resident
    sem,
    *,
    ncx: int,
    ncy: int,
    ncz: int,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        prev_ref[0] = -2

    blk = scalars_ref[0, t]
    kx = scalars_ref[1, t]
    ky = scalars_ref[2, t]
    kz = scalars_ref[3, t]
    lvl = scalars_ref[4, t]

    # Full-block DMA; consecutive tiles of the same block reuse it.
    @pl.when(jnp.logical_and(blk >= 0, blk != prev_ref[0]))
    def _():
        dma = pltpu.make_async_copy(data_ref.at[blk], block_ref, sem)
        dma.start()
        dma.wait()
        prev_ref[0] = blk

    lvl32 = lvl.astype(jnp.int32)
    sx = jax.lax.shift_right_logical(jnp.int32(ncx), lvl32)
    base = kx.astype(jnp.int32) * sx

    # x-axis select+expand: unrolled row reads at traced offsets.
    rows = [
        block_ref[pl.ds(base + jax.lax.shift_right_logical(jnp.int32(o), lvl32), 1), :]
        for o in range(ncx)
    ]
    tile = jnp.concatenate(rows, axis=0)  # (ncx, ncy*ncz)

    # (y,z) select+expand: one matmul with the Kronecker matrix.
    # Precision HIGHEST: the default single-pass bf16 MXU path would
    # round the copied values (M is 0/1, so the product must be exact).
    M = _kron_select_matrix(ky, kz, lvl, ncy, ncz, tile.dtype)
    tile = jax.lax.dot_general(
        tile,
        M,
        (((1,), (0,)), ((), ())),
        preferred_element_type=tile.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )

    out_ref[...] = jnp.where(blk >= 0, tile, 0)[None]


@lru_cache(maxsize=16)
def _build_regrid_fn(
    data_shape: Tuple[int, int, int, int],
    tiles: Tuple[int, int, int],
    dtype_name: str,
    interpret: bool = False,
):
    nb, ncx, ncy, ncz = data_shape
    tx, ty, tz = tiles
    ntiles = tx * ty * tz
    dtype = jnp.dtype(dtype_name)

    kernel = partial(_regrid_kernel, ncx=ncx, ncy=ncy, ncz=ncz)

    def run(scalars, data):
        data2 = data.reshape(nb, ncx, ncy * ncz)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (1, ncx, ncy * ncz), lambda t, s: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((ncx, ncy * ncz), dtype),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        out_tiles = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ntiles, ncx, ncy * ncz), dtype),
            interpret=interpret,
        )(scalars, data2)
        # Tile-major -> volume (XLA handles the transpose).
        vol = out_tiles.reshape(tx, ty, tz, ncx, ncy, ncz)
        vol = jnp.transpose(vol, (0, 3, 1, 4, 2, 5))
        return vol.reshape(tx * ncx, ty * ncy, tz * ncz)

    return jax.jit(run)


def build_tile_tables(plan) -> Tuple[np.ndarray, Tuple[int, int, int], Tuple[int, int, int]]:
    """Per-tile scalar tables over the aligned tile window of a RegridPlan.

    Returns (scalars (5, nTiles) int32, tile counts, in-window offset of
    the requested output region).
    """
    nc = plan.ncells_vec
    lo = plan.out_origin
    hi = plan.out_origin + plan.total_cells
    t0 = (lo // nc).astype(np.int64)
    t1 = -(-hi // nc)  # ceil
    tiles = tuple(int(t1[a] - t0[a]) for a in range(3))

    table = plan.leaf_table
    sl = tuple(slice(int(t0[a]), int(t1[a])) for a in range(3))
    blk = table[sl].astype(np.int32)

    scales = plan.block_scales
    safe = np.maximum(blk, 0)
    s = scales[safe].astype(np.int64)
    lvl = np.round(np.log2(s)).astype(np.int32)

    offs = plan.block_offsets  # (nB, 3) fine cells
    ks = []
    for a in range(3):
        gx_t = np.arange(int(t0[a]), int(t1[a]))
        shape = [1, 1, 1]
        shape[a] = len(gx_t)
        gx_t = gx_t.reshape(shape)
        off_fb = offs[safe, a] // int(nc[a])  # fine-block coords of block start
        k = (gx_t - off_fb).astype(np.int32)
        ks.append(k)

    invalid = blk < 0
    lvl = np.where(invalid, 0, lvl)
    ks = [np.where(invalid, 0, np.broadcast_to(k, blk.shape)) for k in ks]

    scalars = np.stack(
        [
            blk.reshape(-1),
            ks[0].reshape(-1),
            ks[1].reshape(-1),
            ks[2].reshape(-1),
            lvl.reshape(-1),
        ]
    ).astype(np.int32)

    inner_off = tuple(int(lo[a] - t0[a] * nc[a]) for a in range(3))
    return scalars, tiles, inner_off


def regrid_fields_pallas(plan, data, fields):
    """Tile-DMA regrid of each field; returns dict of output volumes."""
    first = data[fields[0]]
    if first.ndim == 3:
        raise ValueError("regrid expects (nblocks, ncx, ncy, ncz) stacks")
    data_shape = tuple(int(s) for s in first.shape)

    scalars, tiles, inner_off = build_tile_tables(plan)

    fn = _build_regrid_fn(data_shape, tiles, str(first.dtype), _pk.FORCE_INTERPRET)
    scalars_d = jnp.asarray(scalars)

    out = {}
    ox, oy, oz = inner_off
    nx, ny, nz = plan.out_shape
    for name in fields:
        aligned = fn(scalars_d, data[name])
        out[name] = jax.lax.slice(aligned, (ox, oy, oz), (ox + nx, oy + ny, oz + nz))
    return out
