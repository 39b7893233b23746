"""Kinetic-energy spectra: 3D FFT + spherical shell binning.

TPU-native redesign of the reference's Federrath-derived implementation
(reference: fava/mesh/FLASH/FlashUniform.py:229-304). Differences by
design:

* The FFT is the pod-sharded slab FFT from :mod:`fava_tpu.parallel.fft`
  when a device mesh is active — the reference computes the full
  ``np.fft.fftn`` redundantly on every rank.
* No ``fftshift``: shell binning and the longitudinal projection are
  permutation-invariant in k, so we use the matching unshifted integer
  wavenumber grid. Results are identical for even grid sizes (the
  reference's ``linspace`` k-grid is only integer-valued for even n).
* The reference applies a stray ``.T`` to each velocity FFT in the
  longitudinal projection for ndim>1 (FlashUniform.py:281) — a bug
  inherited from a 2D-specific source. We compute the correct
  projection sum(k_n * w_n); the NumPy oracle covers both behaviors.

Shell binning replicates ``scipy.stats.binned_statistic(..., "mean")``
with edges ``arange(max(n)//2) - 0.5``: right-inclusive last edge,
NaN for empty shells.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fava_tpu.parallel import fft as pfft
from fava_tpu.parallel import runtime
from fava_tpu.utils import accum_dtype


def _wavenumber_grid(shape: Tuple[int, ...], dtype):
    """Unshifted integer wavenumber component grids for an ndim volume."""
    ks = []
    nd = len(shape)
    for axis, n in enumerate(shape):
        k = pfft._wavenumbers(n, dtype)
        kshape = [1] * nd
        kshape[axis] = n
        ks.append(k.reshape(kshape))
    return ks


def _split_nyquist(k, n: int, idx):
    """Signed wavenumbers -> (conjugate-even part, Nyquist magnitude).

    Even extents place the self-conjugate Nyquist mode at idx == n//2
    (signed value -n/2); odd extents have none. Used to keep the
    longitudinal projection exact on rfft half-spectra (see
    rfft_power_volumes).
    """
    if n % 2 == 0:
        is_nyq = idx == n // 2
        zero = jnp.zeros((), dtype=k.dtype)
        return (
            jnp.where(is_nyq, zero, k),
            jnp.where(is_nyq, jnp.asarray(n / 2.0, dtype=k.dtype), zero),
        )
    return k, jnp.zeros_like(k)


def rfft_power_volumes(ffts, full_shape: Tuple[int, int, int], jy=None, ky=None, jx=None, kx=None):
    """(total, longi, trans, k_abs) power volumes of z-rfft half-spectra.

    ``ffts`` are the three velocity transforms with a half z axis
    (length nz//2+1). Shell-binning these with Hermitian weights must
    reproduce the full-grid computation exactly; for the longitudinal
    projection that requires care at Nyquist planes: the full-grid
    convention assigns k = -n/2 at BOTH a Nyquist-component point j and
    its conjugate -j, so the projection is not conjugate-even there.
    Splitting k into a conjugate-even "regular" part and a
    self-conjugate "Nyquist" part, the full-grid pair sum over {j, -j}
    equals 2(|reg.w|^2 + |nyq.w|^2) — so weight-2 (kz>0) planes use
    |reg.w|^2 + |nyq.w|^2 and the kz=0 plane (whose points are full-grid
    points verbatim) uses the plain signed formula |reg.w - nyq.w|^2.
    Validated against full-grid binning in tests/test_spectra.py.

    ``jy``/``ky`` (and ``jx``/``kx``) override the y (x) wavenumbers for
    sharded or chunked k-slabs (1D arrays of global indices / signed
    wavenumbers).
    """
    nx, ny, nz = full_shape
    nzr = ffts[0].shape[-1]
    rdt = ffts[0].real.dtype
    if kx is None:
        kx = pfft._wavenumbers(nx, rdt)
        jx = jnp.arange(nx)
    kx = kx[:, None, None]
    jx = jx[:, None, None]
    if ky is None:
        ky = pfft._wavenumbers(ny, rdt)
        jy = jnp.arange(ny)
    ky = ky[None, :, None]
    jy = jy[None, :, None]
    jz = jnp.arange(nzr)[None, None, :]
    kz = jz.astype(rdt)

    k_abs = jnp.sqrt(kx * kx + ky * ky + kz * kz)
    total = 0.5 * sum(jnp.abs(f) ** 2 for f in ffts)

    kx_r, kx_n = _split_nyquist(kx, nx, jx)
    ky_r, ky_n = _split_nyquist(ky, ny, jy)
    kz_r, kz_n = _split_nyquist(kz, nz, jz)
    reg = kx_r * ffts[0] + ky_r * ffts[1] + kz_r * ffts[2]
    nyq = kx_n * ffts[0] + ky_n * ffts[1] + kz_n * ffts[2]

    guard = jnp.maximum(k_abs, jnp.asarray(1e-30, rdt))
    longi = jnp.where(
        jz == 0,
        jnp.abs((reg - nyq) / guard) ** 2,
        jnp.abs(reg / guard) ** 2 + jnp.abs(nyq / guard) ** 2,
    )
    return total, longi, total - longi, k_abs


def static_shell_counts(full_shape, nbins: int):
    """Static Hermitian shell counts as a device constant — the value
    every consumer of ``local_spectra_fn`` MUST substitute for its
    zero-placeholder counts under kernel binning (one helper so no
    consumer forgets and silently NaNs the spectrum via counts == 0)."""
    from fava_tpu.ops import pallas_kernels as pk

    adt = accum_dtype()
    return jnp.asarray(
        pk.rfft_shell_counts(tuple(int(s) for s in full_shape), int(nbins), str(jnp.dtype(adt)))
    )


def use_kernel_shell_binning(nx: int) -> bool:
    """One definition of the sharded binning-path choice (Pallas chunk
    kernel on TPU/interpret vs jnp scatter-add) for every consumer, so
    the decision — which is baked into cached traces — can be folded
    into cache keys consistently."""
    from fava_tpu.ops import pallas_kernels as pk

    return bool((pk.on_tpu() or pk.FORCE_INTERPRET) and pk._pick_gy(nx))


def local_spectra_fn(full_shape, nbins: int, nd: int, axis_name: str, use_kernel_binning: bool):
    """Device-local spectra body for use INSIDE a shard_map over ``axis_name``.

    Returns ``local(d_loc, *v_loc) -> (counts, sums[3])`` where the
    inputs are x-slab shards of one snapshot: local 2D FFT ->
    all_to_all shard transpose -> local 1D FFT -> local k-slab powers
    and shell binning -> psum of the accumulators. Shared by the
    single-snapshot shard_map below and the snap x space pod series
    step (flagship.sharded_series_analysis_step), which calls it from
    inside a lax.scan over the local snapshot batch.

    With ``use_kernel_binning`` the returned counts are a placeholder
    (zeros): shard counts psum to a pure shape function, precomputed on
    host via ``pallas_kernels.rfft_shell_counts`` — the CALLER
    substitutes them (see sharded_power_spectra).
    """
    nx, ny, nz = (int(s) for s in full_shape)
    ntot = nx * ny * nz
    nzr = nz // 2 + 1
    adt = accum_dtype()

    from fava_tpu.ops import dft as dftops
    from fava_tpu.ops import pallas_kernels as pk

    def local(d_loc, *v_loc):
        sd = jnp.sqrt(d_loc)
        ffts = []
        for v in v_loc:
            # Real input: rfft along z halves local FFT work and the
            # all_to_all payload; Hermitian weights below make shell
            # sums exactly equal to the full-grid computation. On TPU
            # the per-axis transforms are dense MXU DFT matmuls
            # (ops/dft.py) — XLA's FFT lowering is ~10x off roofline.
            w = dftops.rfft_trailing_fast(sd * v)
            w = dftops.fft_axis_fast(w, axis=1)
            w = jax.lax.all_to_all(w, axis_name, split_axis=1, concat_axis=0, tiled=True)
            ffts.append(dftops.fft_axis_fast(w, axis=0) / ntot)

        idx = jax.lax.axis_index(axis_name)
        lo = idx * (ny // nd)
        rdt = ffts[0].real.dtype
        ky_full = pfft._wavenumbers(ny, rdt)
        ky = jax.lax.dynamic_slice(ky_full, (lo,), (ny // nd,))
        jy = lo + jnp.arange(ny // nd)
        total, longi, trans, k_abs = rfft_power_volumes(ffts, (nx, ny, nz), jy=jy, ky=ky)

        if use_kernel_binning:
            # Pallas mask-loop binning of the local k-slab: XLA's
            # scatter-add is the slow path on TPU (~174 ms for a
            # 16M-point scatter measured at 256^3). The chunk kernel's
            # math is symmetric in the slab/middle axes, so the local
            # y-slab binning is the x-chunk kernel on the TRANSPOSED
            # block with the global y offset as the chunk origin.
            # Values only: shard counts psum to a pure shape function,
            # precomputed on host (rfft_shell_counts).
            s_loc = pk.shell_bin_values_rfft_chunk(
                jnp.swapaxes(total, 0, 1),
                jnp.swapaxes(longi, 0, 1),
                nbins,
                ny,  # slab axis is GLOBAL y
                nz,
                lo,
            )
            counts = jnp.zeros((nbins,), dtype=adt)  # substituted below
            sums = s_loc.astype(adt)
        else:
            jz = jnp.arange(nzr)
            self_conj = jz == 0
            if nz % 2 == 0:  # Nyquist plane exists only for even extents
                self_conj = self_conj | (jz == nz // 2)
            weight = jnp.where(self_conj, 1.0, 2.0).astype(adt)
            weight = jnp.broadcast_to(weight[None, None, :], k_abs.shape)

            bidx = jnp.clip(jnp.floor(k_abs + 0.5).astype(jnp.int32), 0, nbins - 1).ravel()
            mask = (k_abs <= (nbins - 0.5)).ravel()
            w_flat = jnp.where(mask, weight.ravel(), 0)
            counts = jnp.zeros(nbins, dtype=adt).at[bidx].add(w_flat)
            stacked = jnp.stack([total.ravel(), longi.ravel(), trans.ravel()]).astype(adt)
            sums = jnp.zeros((3, nbins), dtype=adt).at[:, bidx].add(stacked * w_flat)
        return jax.lax.psum(counts, axis_name), jax.lax.psum(sums, axis_name)

    return local


def sharded_power_spectra(dens, vels, mesh, nbins: int, axis_name: str = None):
    """(counts, sums[3]) of shell-binned spectral powers over a device mesh.

    One shard_map: per-device local 2D FFT -> all_to_all shard transpose
    -> local 1D FFT -> local k-slab powers and scatter binning -> one
    psum of the (4, nbins) accumulators. Everything rides ICI once; no
    global reshapes or partitioner-inserted gathers.
    """
    from fava_tpu.parallel import runtime as prt

    axis_name = axis_name or prt.SPACE_AXIS
    shape = tuple(int(s) for s in dens.shape)
    nx, ny, nz = shape
    nd = mesh.shape[axis_name]

    use_kernel_binning = use_kernel_shell_binning(nx)
    local = local_spectra_fn(shape, nbins, nd, axis_name, use_kernel_binning)

    from jax.sharding import PartitionSpec as P

    spec = P(axis_name, None, None)
    # Replicate over any other mesh axes by naming only the space axis.
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, which the shard_map checker (on by default) rejects.
    counts, sums = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec,) * (1 + len(vels)),
        out_specs=(P(), P()),
        check_vma=False,
    )(dens, *vels)
    if use_kernel_binning:
        counts = static_shell_counts((nx, ny, nz), nbins)
    return counts, sums


@lru_cache(maxsize=32)
def _build_spectra_fn(shape: Tuple[int, ...], mesh_key, nbins: int, path_key=None):
    """Jitted spectra core for a given volume shape (cached per shape/mesh).

    ``path_key`` folds backend-dependent dispatch state (platform +
    FORCE_INTERPRET) into the cache key: the binning-path choice is
    baked into the trace, so a trace built under one state must not be
    reused under another (a stale cached scatter trace silently
    masked the Pallas shard_map binning in tests).
    """
    mesh = mesh_key  # jax.sharding.Mesh is hashable
    ndim = len(shape)
    ntot = int(np.prod(shape))

    from fava_tpu.parallel import runtime as prt

    use_shard_map = (
        mesh is not None
        and ndim == 3
        and prt.SPACE_AXIS in getattr(mesh, "axis_names", ())
        and mesh.shape[prt.SPACE_AXIS] > 1
        and shape[0] % mesh.shape[prt.SPACE_AXIS] == 0
        and shape[1] % mesh.shape[prt.SPACE_AXIS] == 0
    )

    def core(dens, vels):
        adt = accum_dtype()

        if use_shard_map:
            counts, sums = sharded_power_spectra(dens, tuple(vels), mesh, nbins)
            return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), jnp.nan)

        if mesh is None and ndim == 3:
            # Real input: rfft half-spectrum + Hermitian-weighted shell
            # binning — exactly equal to the full-grid result at half
            # the FFT and binning cost.
            from fava_tpu.ops.pallas_kernels import shell_bin_sums_rfft

            from fava_tpu.ops.dft import rfftn_fast, use_mxu_fft

            nx, ny, nz = shape
            sqrt_d = jnp.sqrt(dens)
            if use_mxu_fft(shape):
                ffts = [rfftn_fast(sqrt_d * v) / ntot for v in vels]
            else:
                fft3 = (
                    jnp.fft.rfftn(jnp.stack([sqrt_d * v for v in vels]), axes=(1, 2, 3)) / ntot
                )
                ffts = [fft3[i] for i in range(len(vels))]
            total, longi, trans, _ = rfft_power_volumes(ffts, (nx, ny, nz))
            counts, sums = shell_bin_sums_rfft(
                total.astype(adt), longi.astype(adt), trans.astype(adt), nbins, nz
            )
            return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), jnp.nan)

        sqrt_d = jnp.sqrt(dens)
        ffts = []
        for v in vels:
            w = sqrt_d * v
            if ndim == 3:
                fw = pfft.pfft3(w.astype(jnp.promote_types(w.dtype, jnp.float32)), mesh=mesh)
            else:
                fw = jnp.fft.fftn(w)
            ffts.append(fw / ntot)  # norm="forward"

        ks = _wavenumber_grid(shape, ffts[0].real.dtype)
        k_abs2 = sum(k * k for k in ks)
        k_abs = jnp.sqrt(k_abs2) if ndim > 1 else jnp.abs(ks[0])

        total = 0.5 * sum(jnp.abs(f) ** 2 for f in ffts)

        longitudinal = sum(k * f for k, f in zip(ks, ffts))
        longitudinal = jnp.abs(longitudinal / jnp.maximum(k_abs, jnp.asarray(1e-30, k_abs.dtype))) ** 2
        transverse = total - longitudinal

        # binned_statistic "mean" with edges arange(nbins+1)-0.5.
        # (Only sharded/low-dim volumes reach here: the mesh-is-None 3D
        # case returned through the rfft fast path above, so this is
        # the local scatter-add partitioned over the mesh.)
        stacked = jnp.stack([total.ravel(), longitudinal.ravel(), transverse.ravel()])
        idx = jnp.clip(jnp.floor(k_abs + 0.5).astype(jnp.int32), 0, nbins - 1)
        include = k_abs <= (nbins - 0.5)
        flat_idx = idx.ravel()
        mask = include.ravel()
        counts = jnp.zeros(nbins, dtype=adt).at[flat_idx].add(mask.astype(adt))
        sums = jnp.zeros((3, nbins), dtype=adt).at[:, flat_idx].add(
            jnp.where(mask, stacked.astype(adt), 0)
        )
        means = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), jnp.nan)
        return means

    return jax.jit(core)


def _squeeze_trailing(arr, ndim: int):
    """Drop singleton trailing axes of low-dimensional datasets.

    Raises (not an assert — python -O strips those) when a trailing
    axis is non-singleton, which would otherwise surface later as an
    opaque reshape error."""
    if arr.ndim > ndim:
        squeeze = tuple(range(ndim, arr.ndim))
        if not all(arr.shape[a] == 1 for a in squeeze):
            raise ValueError(
                f"non-singleton trailing axes {tuple(arr.shape[ndim:])} for ndim={ndim}"
            )
        arr = arr.reshape(arr.shape[:ndim])
    return arr


def _shell_integral_factor(nbins: int, ndim: int) -> np.ndarray:
    """k^(d-1) * 2*pi*(d-1) shell factor (reference FlashUniform.py:295-302)
    — ONE definition so KE and scalar spectrum slopes stay comparable."""
    k = np.arange(nbins, dtype=np.float64)
    factor = k ** (ndim - 1)
    if ndim > 1:
        factor = factor * (2.0 * np.pi * (ndim - 1))
    return k, factor


def kinetic_energy_spectra(
    dens: jax.Array,
    vels: Sequence[jax.Array],
    mesh=None,
    ndim: int = None,
) -> Dict[str, np.ndarray]:
    """Total/longitudinal/transverse KE spectra of sqrt(rho)*v.

    Returns {"k", "total", "longitudinal", "transverse"} with the
    reference's integral factor k^(d-1) * 2*pi*(d-1) applied
    (reference: fava/mesh/FLASH/FlashUniform.py:295-302). For 1D/2D
    datasets (singleton trailing axes), pass ``ndim`` so the dimension
    is honored in the wavenumbers and the integral factor.
    """
    mesh = mesh if mesh is not None else runtime.get_mesh()
    ndim = int(ndim) if ndim is not None else len(vels)
    if dens.ndim > ndim:
        dens = _squeeze_trailing(dens, ndim)
        vels = [v.reshape(v.shape[:ndim]) for v in vels]
    shape = tuple(int(s) for s in dens.shape)
    nbins = max(shape) // 2 - 1  # len(bins)-1 with bins = arange(max//2)-0.5

    from fava_tpu.ops import pallas_kernels as pk

    fn = _build_spectra_fn(shape, mesh, nbins, pk.path_key())
    means = np.asarray(fn(dens, tuple(vels)), dtype=np.float64)

    k, integral_factor = _shell_integral_factor(nbins, ndim)

    return {
        "k": k,
        "total": means[0] * integral_factor,
        "longitudinal": means[1] * integral_factor,
        "transverse": means[2] * integral_factor,
    }


@lru_cache(maxsize=32)
def _build_scalar_spectrum_fn(shape: Tuple[int, ...], mesh_key, nbins: int, path_key=None):
    """Jitted scalar power-spectrum core (cached per shape/mesh/backend)."""
    mesh = mesh_key
    ndim = len(shape)
    ntot = int(np.prod(shape))
    adt = accum_dtype()

    def core(field):
        if mesh is not None and ndim == 3:
            # Sharded inputs must NOT hit the single-chip Pallas path
            # (it cannot consume mesh-sharded arrays): pod-sharded
            # pencil FFT + GSPMD-partitioned scatter binning, like
            # _build_spectra_fn's generic branch.
            fw = pfft.pfft3(
                field.astype(jnp.promote_types(field.dtype, jnp.float32)), mesh=mesh
            ) / ntot
        elif ndim == 3:
            from fava_tpu.ops.dft import rfftn_fast
            from fava_tpu.ops.pallas_kernels import shell_bin_sums_rfft_scalar

            fw = rfftn_fast(field) / ntot
            p = (jnp.abs(fw) ** 2).astype(adt)
            counts, sums = shell_bin_sums_rfft_scalar(p, nbins, shape[-1])
            return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), jnp.nan)
        else:
            fw = jnp.fft.fftn(field) / ntot

        p = (jnp.abs(fw) ** 2).astype(adt)
        ks = _wavenumber_grid(shape, p.dtype)
        k_abs = jnp.sqrt(sum(k * k for k in ks)) if ndim > 1 else jnp.abs(ks[0])
        idx = jnp.clip(jnp.floor(k_abs + 0.5).astype(jnp.int32), 0, nbins - 1).ravel()
        mask = (k_abs <= (nbins - 0.5)).ravel()
        counts = jnp.zeros(nbins, dtype=adt).at[idx].add(mask.astype(adt))
        sums = jnp.zeros(nbins, dtype=adt).at[idx].add(jnp.where(mask, p.ravel(), 0))
        return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), jnp.nan)

    return jax.jit(core)


def scalar_spectrum(
    field: jax.Array,
    ndim: int = None,
    mesh=None,
) -> Dict[str, np.ndarray]:
    """Shell-binned power spectrum of ONE scalar field.

    Beyond the reference (which only computes KE spectra of
    sqrt(rho)*v): density / flame-progress / temperature power spectra
    are standard turbulence diagnostics and reuse the same forward-norm
    transform and scipy-convention shell binning (mean over the shell,
    edges arange(max(n)//2) - 0.5), with the same k^(d-1)*2*pi*(d-1)
    integral factor so slopes are directly comparable with the KE
    spectra. Returns {"k", "power"}.
    """
    mesh = mesh if mesh is not None else runtime.get_mesh()
    ndim = int(ndim) if ndim is not None else field.ndim
    field = _squeeze_trailing(field, ndim)
    shape = tuple(int(s) for s in field.shape)
    nbins = max(shape) // 2 - 1

    from fava_tpu.ops import pallas_kernels as pk

    fn = _build_scalar_spectrum_fn(shape, mesh, nbins, pk.path_key())
    mean = np.asarray(fn(field), dtype=np.float64)

    k, integral_factor = _shell_integral_factor(nbins, ndim)
    return {"k": k, "power": mean * integral_factor}
