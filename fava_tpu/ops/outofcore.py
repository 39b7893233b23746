"""Out-of-core flagship analysis for volumes exceeding single-chip HBM.

A 1024^3 float32 snapshot needs 4 x 4.3 GB of fields plus FFT
temporaries — more than one v5e's 16 GB. The pod answer is the sharded
flagship (slab sharding + sharded FFT), but a single chip can still run
the FULL spectra + profile suite by streaming:

Stage A (one pass over x-slabs, host -> device):
  upload (dens, velx, vely, velz) slabs; per velocity component compute
  w = sqrt(dens) * v and apply the z (real) and y (complex) DFTs — both
  LOCAL to an x-slab — writing into three device-resident zy-spectra
  buffers (complex64, the dominant HBM cost: 3 x nx*ny*(nz/2+1)*8 B).
  The same slab visit computes the profile row moments: on a uniform
  volume every x-row is one profile bin, entirely inside its slab, so
  the raw AND centered moments finish in this single pass.

Stage B (kx-chunked, device-only):
  the x-axis DFT couples slabs but is a matmul over x — apply it one
  kx-chunk at a time (einsum with a (chunk, nx) DFT matrix slice on the
  MXU), form the spectral powers, and shell-bin each chunk as it is
  produced (Pallas kernel with the chunk's kx offset scalar-prefetched).
  Peak extra memory is one chunk (~chunk/nx of a full volume).

The result dict matches flagship.uniform_analysis_step exactly (same
keys, same math; validated in tests/test_outofcore.py). Reference being
replaced at this scale: redundant full-volume np.fft.fftn per rank,
fava/mesh/FLASH/FlashUniform.py:268.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fava_tpu.ops import dft
from fava_tpu.ops import pallas_kernels as pk
from fava_tpu.ops.spectra import rfft_power_volumes
from fava_tpu.utils import accum_dtype

# field_slab(name, x0, x1) -> np.ndarray of shape (x1-x0, ny, nz)
SlabLoader = Callable[[str, int, int], np.ndarray]

FIELDS = ("dens", "velx", "vely", "velz")


@lru_cache(maxsize=8)
def _stage_a_comp_fn(full_shape: Tuple[int, int, int], precision=None):
    """One component's slab transform + buffer update (donated).

    Split per component so only ONE buffer's einsum temporaries are
    live at a time — a fused 3-buffer program held ~3.7 GB of HLO temps
    and pushed a 1024^3 run past 16 GB HBM. The zy spectra are stored
    PLANAR (separate re/im f32 buffers): XLA materializes full-size
    real/imag extraction temps when matmul-contracting a complex64
    array, which alone re-OOMed stage B at 1024^3.
    """
    nx, ny, nz = full_shape
    precision = dft.PRECISION if precision is None else precision

    def run(buf_re, buf_im, d_slab, v, i0):
        rdt = d_slab.dtype.name
        cr, ci = (jnp.asarray(m) for m in dft._rdft_mats(nz, rdt))
        dy = dft._dft_mat(ny, rdt)
        dyr = jnp.asarray(dy.real.copy())
        dyi = jnp.asarray(dy.imag.copy())
        w = jnp.sqrt(d_slab) * v
        zre = jnp.einsum("xyz,zk->xyk", w, cr, precision=precision)
        zim = jnp.einsum("xyz,zk->xyk", w, ci, precision=precision)
        # Complex y-DFT as real matmuls (keeps everything planar).
        yre, yim = dft.planar_complex_matmul(
            "ab,xbz->xaz", dyr, dyi, zre, zim, precision=precision
        )
        zero = jnp.zeros((), dtype=i0.dtype)
        return (
            jax.lax.dynamic_update_slice(buf_re, yre, (i0, zero, zero)),
            jax.lax.dynamic_update_slice(buf_im, yim, (i0, zero, zero)),
        )

    return jax.jit(run, donate_argnums=(0, 1))


@lru_cache(maxsize=8)
def _stage_a_moments_fn(full_shape: Tuple[int, int, int]):
    nx, ny, nz = full_shape

    def run(d_slab, vx, vy, vz):
        # Profile moments: each x-row is a whole profile bin.
        raw = pk.block_row_moments(d_slab[None], vx[None], vy[None], vz[None])[:, 0, :]
        means = (raw[1:4].astype(accum_dtype()) / (ny * nz)).astype(d_slab.dtype)
        cen = pk.block_centered_row_moments(
            d_slab[None], vx[None], vy[None], vz[None], means[:, None, :]
        )[:, 0, :]
        return raw, cen

    return jax.jit(run)


@lru_cache(maxsize=8)
def _stage_b_fn(full_shape: Tuple[int, int, int], chunk: int, nbins: int, precision=None):
    nx, ny, nz = full_shape
    precision = dft.PRECISION if precision is None else precision

    def run(bufs, dxr, dxi, kx0, acc_sums):
        # dxr/dxi: (chunk, nx) real/imag DFT rows, pre-scaled by 1/ntot.
        # Planar real matmuls per component; complex only at chunk size.
        ws = []
        for b_re, b_im in bufs:
            wre, wim = dft.planar_complex_matmul(
                "kx,xyz->kyz", dxr, dxi, b_re, b_im, precision=precision
            )
            ws.append(jax.lax.complex(wre, wim))
        jxg = kx0 + jnp.arange(chunk)
        kxv = jnp.where(jxg <= (nx - 1) // 2, jxg, jxg - nx).astype(ws[0].real.dtype)
        total, longi, trans, _ = rfft_power_volumes(
            ws, full_shape, jx=jxg, kx=kxv
        )
        # Values only: chunk counts sum to a pure shape function,
        # substituted from the static table by the caller (the wrapper
        # handles the off-TPU jnp fallback itself).
        sums = pk.shell_bin_values_rfft_chunk(total, longi, nbins, nx, nz, kx0)
        return acc_sums + sums

    return jax.jit(run)


def streamed_uniform_analysis(
    field_slab: SlabLoader,
    shape: Tuple[int, int, int],
    *,
    slab_rows: int = 64,
    chunk_rows: int = 128,
    dtype=jnp.float32,
) -> Dict[str, np.ndarray]:
    """Full spectra + Reynolds/Favre profile suite, streamed from host.

    Matches flagship.uniform_analysis_step's output dict for volumes
    that cannot be device-resident. ``slab_rows``/``chunk_rows`` must
    divide nx.
    """
    nx, ny, nz = (int(s) for s in shape)
    assert nx % slab_rows == 0 and nx % chunk_rows == 0
    nzr = nz // 2 + 1
    nbins = max(shape) // 2 - 1
    adt = accum_dtype()

    bufs = [
        (jnp.zeros((nx, ny, nzr), dtype=dtype), jnp.zeros((nx, ny, nzr), dtype=dtype))
        for _ in range(3)
    ]
    # Builders are lru_cached (keyed on shape + the precision knob) so a
    # streamed SERIES retraces nothing per snapshot — a fresh jit per
    # call re-embedded the (ny, ny) DFT matrices into every trace.
    stage_a = _stage_a_comp_fn((nx, ny, nz), dft.PRECISION)
    stage_a_moments = _stage_a_moments_fn((nx, ny, nz))

    raws = []
    cens = []
    for x0 in range(0, nx, slab_rows):
        slabs = [
            jnp.asarray(field_slab(name, x0, x0 + slab_rows), dtype=dtype) for name in FIELDS
        ]
        i0 = jnp.asarray(x0, dtype=jnp.int32)
        for c in range(3):
            bufs[c] = stage_a(*bufs[c], slabs[0], slabs[1 + c], i0)
        raw, cen = stage_a_moments(*slabs)
        raws.append(raw)
        cens.append(cen)

    raw = jnp.concatenate([r.astype(adt) for r in raws], axis=-1)  # (7, nx)
    cen = jnp.concatenate([c.astype(adt) for c in cens], axis=-1)  # (9, nx)

    # --- Stage B: kx-chunked x-DFT + powers + binning -----------------
    stage_b = _stage_b_fn((nx, ny, nz), chunk_rows, nbins, dft.PRECISION)
    dmat = dft._dft_mat(nx, jnp.dtype(dtype).name) / (nx * ny * nz)
    sums = jnp.zeros((3, nbins), dtype=adt)
    for kx0 in range(0, nx, chunk_rows):
        dxr = jnp.asarray(dmat[kx0 : kx0 + chunk_rows].real.copy())
        dxi = jnp.asarray(dmat[kx0 : kx0 + chunk_rows].imag.copy())
        sums = stage_b(bufs, dxr, dxi, jnp.asarray(kx0, dtype=jnp.int32), sums)
    # Counts are a pure shape function (see rfft_shell_counts).
    counts = jnp.asarray(pk.rfft_shell_counts((nx, ny, nz), nbins, str(jnp.dtype(adt))))

    # --- Assemble the flagship output dict ----------------------------
    from fava_tpu.ops.profiles import assemble_profile_stats

    layer = jnp.asarray(ny * nz, dtype=adt)
    d_row = raw[0]
    mean_d = d_row / layer
    means = raw[1:4] / layer  # slab means ARE the bin means (rows = bins)
    stress, favre_mean, favre_rms = assemble_profile_stats(
        d_row, means, cen[6:9], cen[:6], layer
    )

    out = {
        "spectra_counts": counts,
        "spectra_total": sums[0],
        "spectra_longitudinal": sums[1],
        "spectra_transverse": sums[2],
        "mean_dens": mean_d,
        "reynolds_stress": stress,
        "favre_mean": favre_mean,
        "favre_rms": favre_rms,
        "total_mass": jnp.sum(d_row),
    }
    return {k: np.asarray(v) for k, v in out.items()}
