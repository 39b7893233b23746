"""Axis-binned profile statistics over AMR block stacks.

TPU-native redesign of the reference's per-cell Python accumulation
loops (reference: fava/mesh/FLASH/_flash.py:1451-1611). The key
transformation: the reference's second pass

    stress[ii] += sum(dens * (vi - <vi>[ii]) * (vj - <vj>[ii])) * volfrac

is algebraically expanded into per-(block, row) moments

    S_d = sum(dens), S_dvi = sum(dens*vi), S_dvivj = sum(dens*vi*vj)

so the whole two-pass algorithm becomes ONE fused read of the field
data (13 reductions in 3D, XLA-fused) followed by tiny profile
arithmetic — no data-dependent loops, everything jittable with static
shapes. Scatter into finest-level bins is done per refinement level
(static small set), where every block covers the same number of fine
bins, as a vectorized repeat + scatter-add.

The numerical result matches the reference to floating-point
rearrangement (summation order differs; validated to ~1e-12 relative in
float64 against the NumPy oracle).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fava_tpu.utils import accum_dtype

AXES_NAMES = "xyz"


def _next_bucket(n: int) -> int:
    """Round block counts up to a power-of-two bucket to bound recompiles."""
    if n <= 0:
        return 1
    return 1 << (n - 1).bit_length()


@partial(jax.jit, static_argnames=("raxis", "nvel"))
def _row_moments(fields: Tuple[jax.Array, ...], raxis: int, nvel: int):
    """Per-(block, row) raw sums along the profile axis.

    ``fields`` = (dens, v0..v_{nvel-1}); each (nB, nx, ny, nz).
    Returns stacked moments (1 + 2*nvel, nB, nrb):
      [dens, v_i..., dens*v_i...]
    """
    dens = fields[0]
    vels = fields[1 : 1 + nvel]
    red = tuple(a for a in (1, 2, 3) if a != raxis + 1)

    def rsum(x):
        return jnp.sum(x, axis=red)

    moments = [rsum(dens)]
    moments += [rsum(v) for v in vels]
    moments += [rsum(dens * v) for v in vels]
    return jnp.stack(moments)


@partial(jax.jit, static_argnames=("raxis", "nvel"))
def _centered_row_moments_stack(fields: Tuple[jax.Array, ...], mu: jax.Array, raxis: int, nvel: int):
    """Per-(block, row) centered moments about per-row means ``mu``.

    Returns (npairs + nvel, nB, nrb): [sum d*ci*cj (i<=j)..., sum d*ci...].
    Centering keeps float32 profiles accurate where the one-pass
    algebraic expansion cancels (see ops.pallas_kernels, lines 153-159).
    """
    dens = fields[0]
    vels = fields[1 : 1 + nvel]
    red = tuple(a for a in (1, 2, 3) if a != raxis + 1)

    def rsum(x):
        return jnp.sum(x, axis=red)

    def expand(m):
        shape = [m.shape[0], 1, 1, 1]
        shape[raxis + 1] = m.shape[1]
        return m.reshape(shape)

    cv = [v - expand(mu[i]).astype(v.dtype) for i, v in enumerate(vels)]
    moments = [rsum(dens * cv[i] * cv[j]) for (i, j) in _pair_indices(nvel)]
    moments += [rsum(dens * c) for c in cv]
    return jnp.stack(moments)


@partial(jax.jit, static_argnames=("scales", "nfine"))
def _scatter_groups(groups, scales: Tuple[int, ...], nfine: int):
    """Scatter per-level grouped row sums into the finest-level profile.

    groups: tuple of (S, vol_frac, ilo) with S (M, nBg, nrb). Each block
    row spreads over ``scale`` consecutive fine bins starting at ilo
    (replaces the reference's per-row slice adds, _flash.py:1572-1577).
    """
    m = groups[0][0].shape[0]
    prof = jnp.zeros((m, nfine), dtype=accum_dtype())
    for (S, vf, ilo), s in zip(groups, scales):
        nrb = S.shape[-1]
        contrib = jnp.repeat(S.astype(accum_dtype()) * vf[None, :, None], s, axis=2)
        idx = ilo[:, None] + jnp.arange(nrb * s)[None, :]
        prof = prof.at[:, idx].add(contrib)
    return prof


class ProfileGeometry:
    """Host-side per-snapshot geometry for finest-level axis profiles."""

    def __init__(
        self,
        *,
        block_bounds: np.ndarray,
        refine_level: np.ndarray,
        blocklist: np.ndarray,
        domain_bounds: np.ndarray,
        ncells_vec: np.ndarray,
        nblks_vec: np.ndarray,
        ndim: int,
        raxis: int,
    ) -> None:
        self.ndim = int(ndim)
        self.raxis = int(raxis)
        self.blocklist = np.asarray(blocklist, dtype=np.int64)
        levels = np.asarray(refine_level)[self.blocklist]

        lmax = int(np.asarray(refine_level).max())
        self.lref_max = lmax
        lrefcells = 2 ** (lmax - 1)
        self.dims = [int(nc * nb * lrefcells) for nc, nb in zip(ncells_vec[:ndim], nblks_vec[:ndim])]
        self.nfine = self.dims[raxis]
        self.nrb = int(ncells_vec[raxis])

        rmin, rmax = float(domain_bounds[raxis, 0]), float(domain_bounds[raxis, 1])
        self.rmin, self.rmax = rmin, rmax
        self.span = np.linspace(rmin, rmax, self.nfine + 1, dtype=np.float64)

        widths = (domain_bounds[:ndim, 1] - domain_bounds[:ndim, 0]).astype(np.float64)
        self.min_deltas = widths / (
            np.asarray(ncells_vec[:ndim]) * np.asarray(nblks_vec[:ndim]) * 2 ** (lmax - 1)
        )

        # Layer cross-section (product of the non-profile axis widths).
        lv = 1.0
        full_widths = (domain_bounds[:, 1] - domain_bounds[:, 0]).astype(np.float64)
        for a in range(3):
            if a != raxis:
                lv *= full_widths[a]
        self.layer_area = lv

        # Per-block: cell volume x (min_delta / block delta along raxis).
        domain_volume = float(np.prod(full_widths))
        cells_at_level = np.ones_like(levels, dtype=np.float64)
        for a in range(ndim):
            cells_at_level *= ncells_vec[a] * nblks_vec[a] * 2.0 ** (levels - 1)
        cell_volumes = domain_volume / cells_at_level
        delta_r = widths[raxis] / (ncells_vec[raxis] * nblks_vec[raxis] * 2.0 ** (levels - 1))
        self.vol_fracs = cell_volumes * (self.min_deltas[raxis] / delta_r)

        # Fine-bin start index of each block along the profile axis
        # (reference uses argmin |span[:-1]-lo|, _flash.py:1567; blocks
        # are grid-aligned so rounding is identical).
        lo = np.asarray(block_bounds)[self.blocklist, raxis, 0].astype(np.float64)
        fine_delta = (rmax - rmin) / self.nfine
        self.ilo = np.rint((lo - rmin) / fine_delta).astype(np.int64)

        self.lref_n = (2 ** (lmax - levels)).astype(np.int64)
        self.levels = levels

        # Group leaf blocks by refinement level; pad each group to a
        # power-of-two bucket (vol_frac = 0) to bound jit recompiles
        # across a snapshot series.
        self.groups: List[Tuple[int, np.ndarray]] = []
        for lev in sorted(set(int(l) for l in levels)):
            sel = np.nonzero(levels == lev)[0]
            self.groups.append((int(2 ** (lmax - lev)), sel))

    def device_groups(self, moments: jax.Array):
        """Split device row-moments (M, nBleaf, nrb) into padded level groups."""
        groups = []
        scales = []
        for scale, sel in self.groups:
            n = sel.size
            bucket = _next_bucket(n)
            pad = bucket - n
            sel_pad = np.concatenate([sel, np.zeros(pad, dtype=sel.dtype)])
            vf = np.concatenate([self.vol_fracs[sel], np.zeros(pad)])
            ilo = np.concatenate([self.ilo[sel], np.zeros(pad, dtype=np.int64)])
            S = jnp.take(moments, jnp.asarray(sel_pad), axis=1)
            groups.append((S, jnp.asarray(vf, dtype=accum_dtype()), jnp.asarray(ilo)))
            scales.append(scale)
        return tuple(groups), tuple(scales)


def _pair_indices(nvel: int) -> List[Tuple[int, int]]:
    return [(i, j) for i in range(nvel) for j in range(i, nvel)]


def _leaf_fields(data: Dict[str, jax.Array], geom: "ProfileGeometry") -> Tuple[jax.Array, ...]:
    """(dens, vels...) leaf stacks, block-sharded over an active mesh."""
    axes = AXES_NAMES[: geom.ndim]
    blk = jnp.asarray(geom.blocklist)
    fields = [jnp.take(data["dens"], blk, axis=0)]
    for a in axes:
        fields.append(jnp.take(data[f"vel{a}"], blk, axis=0))

    # Multi-device: zero-pad the leaf-block axis to the mesh size and
    # shard blocks over ALL mesh axes (blocks are independent) so the
    # moment reductions run fully parallel — on a snap x space pod
    # every device takes a share instead of snap rows replicating.
    # Padded rows are never referenced by the level groups.
    from fava_tpu.parallel import runtime as prt

    sharding = prt.block_sharding(ndim=fields[0].ndim)
    n_shards = prt.device_axis_total() if sharding is not None else 1
    if n_shards > 1:
        pad = (-fields[0].shape[0]) % n_shards
        if pad:
            widths = [(0, pad)] + [(0, 0)] * (fields[0].ndim - 1)
            fields = [jnp.pad(f, widths) for f in fields]
        fields = [jax.device_put(f, sharding) for f in fields]
    return tuple(fields)


def _stack_stats(data: Dict[str, jax.Array], geom: "ProfileGeometry"):
    """Raw + per-row-mean-centered moments of the leaf stack.

    Two fused passes over the field data (the TPU replacement for the
    reference's per-cell accumulation loops, _flash.py:1564-1604):
      raw (1+2n, nB, nrb): [d, v_i, d*v_i]
      mu  (n, nB, nrb):    per-(block, row) velocity means
      cen (npairs+n, nB, nrb): [d*ci*cj, d*ci] centered about mu
    Block stacks along x on a single device take the fused Pallas
    row-kernels; everything else uses the jitted jnp reductions.
    """
    fields = _leaf_fields(data, geom)
    nvel = geom.ndim
    single_device = True
    try:
        single_device = len(fields[0].sharding.device_set) == 1
    except AttributeError:
        pass

    ncells_row = int(np.prod(fields[0].shape[1:])) // int(fields[0].shape[1 + geom.raxis])

    if geom.ndim == 3 and geom.raxis == 0 and single_device:
        from fava_tpu.ops import pallas_kernels as pk

        raw = pk.block_row_moments(*fields)
        mu = (raw[1 : 1 + nvel].astype(accum_dtype()) / ncells_row).astype(fields[0].dtype)
        cen = pk.block_centered_row_moments(*fields, mu)
        return raw, mu, cen

    raw = _row_moments(fields, raxis=geom.raxis, nvel=nvel)
    mu = (raw[1 : 1 + nvel].astype(accum_dtype()) / ncells_row).astype(fields[0].dtype)
    cen = _centered_row_moments_stack(fields, mu, raxis=geom.raxis, nvel=nvel)
    return raw, mu, cen


@partial(jax.jit, static_argnames=("scales", "nfine", "nvel"))
def _scatter_centered_pairs(groups, scales: Tuple[int, ...], nfine: int, ref_fine, nvel: int):
    """Pass-2 scatter: centered covariances against a fine-bin reference.

    groups: tuple of (cen, s_d, mu, vf, ilo) per refinement level, with
    cen (npairs+nvel, nBg, nrb) centered about the per-row means mu and
    s_d (nBg, nrb) the density row sums. ``ref_fine`` (nvel, nfine) is
    the fine-bin profile to center against (layer means for Reynolds
    stress, Favre means for Favre RMS). Uses the exact identity

      sum d*(vi-ri)*(vj-rj) = C_ij + (mu_i-ri)*C_j + (mu_j-rj)*C_i
                              + (mu_i-ri)*(mu_j-rj)*S_d

    whose differences are all at fluctuation scale — no catastrophic
    float32 cancellation, unlike expanding into raw quadratic moments.
    """
    pairs = _pair_indices(nvel)
    npairs = len(pairs)
    adt = accum_dtype()
    prof = jnp.zeros((npairs, nfine), dtype=adt)
    ref = ref_fine.astype(adt)
    for (cen, s_d, mu, vf, ilo), s in zip(groups, scales):
        nrb = s_d.shape[-1]
        idx = ilo[:, None] + jnp.arange(nrb * s)[None, :]  # (nBg, L)

        def rep(a):
            return jnp.repeat(a.astype(adt), s, axis=-1)

        sd_r = rep(s_d)
        delta = rep(mu) - ref[:, idx]  # (nvel, nBg, L)
        cov_r = rep(cen[:npairs])
        c1_r = rep(cen[npairs:])
        contrib = jnp.stack(
            [
                cov_r[p] + delta[i] * c1_r[j] + delta[j] * c1_r[i] + delta[i] * delta[j] * sd_r
                for p, (i, j) in enumerate(pairs)
            ]
        )
        prof = prof.at[:, idx].add(contrib * vf[None, :, None])
    return prof


def _grouped_stats(data: Dict[str, jax.Array], geom: "ProfileGeometry"):
    """Level-grouped (raw, cen+Sd+mu) device groups + pass-1 profile."""
    nvel = geom.ndim
    nraw = 1 + 2 * nvel
    npairs = len(_pair_indices(nvel))
    raw, mu, cen = _stack_stats(data, geom)
    raw = raw.astype(accum_dtype())
    cen = cen.astype(accum_dtype())
    mu = mu.astype(accum_dtype())
    # Recompose the d*v row sums from the centered residuals:
    # sum(d*v) = c1 + mu*sum(d) exactly, and c1 stays accurate in f32
    # where the raw product sum cancels (near-zero-mean velocities).
    raw = raw.at[1 + nvel :].set(cen[npairs : npairs + nvel] + mu * raw[0][None])
    stacked = jnp.concatenate([raw, cen, mu])
    groups, scales = geom.device_groups(stacked)
    raw_groups = tuple((g[0][:nraw], g[1], g[2]) for g in groups)
    cen_groups = tuple(
        (g[0][nraw : nraw + npairs + nvel], g[0][0], g[0][nraw + npairs + nvel :], g[1], g[2])
        for g in groups
    )
    prof_raw = np.asarray(_scatter_groups(raw_groups, scales, geom.nfine), dtype=np.float64)
    return prof_raw, cen_groups, scales


def _is_uniform_fast_case(data: Dict[str, jax.Array], geom: "ProfileGeometry") -> bool:
    """Single uniform block profiled along x on one device: rows == bins."""
    single_device = True
    try:
        single_device = len(data["dens"].sharding.device_set) == 1
    except AttributeError:
        pass
    return (
        geom.ndim == 3
        and geom.raxis == 0
        and geom.blocklist.size == 1
        and geom.nfine == geom.nrb
        and single_device
    )


def _uniform_centered_stats(data: Dict[str, jax.Array], geom: "ProfileGeometry"):
    """Raw first moments + centered second moments for the uniform case.

    Centering about the per-row means avoids float32 cancellation in
    the one-pass expansion (see ops.pallas_kernels.centered_row_moments).
    Returns (d_row, v_rows, cov(6,n), c1(3,n), means_rows), all
    unscaled. The raw d*v sums the moment kernel also produces are NOT
    returned: Favre outputs use the conditioned mu + c1/sum(d) form.
    """
    from fava_tpu.ops.pallas_kernels import centered_row_moments, row_moments_volume

    blk = int(geom.blocklist[0])
    vols = [data["dens"][blk]] + [data[f"vel{a}"][blk] for a in AXES_NAMES[:3]]
    moments = row_moments_volume(*vols)
    d_row = moments[0]
    v_rows = moments[1:4]
    ncells_per_row = vols[0].shape[1] * vols[0].shape[2]
    means_rows = v_rows / ncells_per_row
    centered = centered_row_moments(*vols, means_rows)
    # ONE (16, rows) fetch for the whole stat table (host-link rule:
    # every fetched array pays the tunnel dispatch floor)
    packed = np.asarray(
        jnp.concatenate([d_row[None], v_rows, centered, means_rows], axis=0),
        dtype=np.float64,
    )
    return packed[0], packed[1:4], packed[4:10], packed[10:13], packed[13:16]


def reynolds_stress(
    data: Dict[str, jax.Array],
    geom: ProfileGeometry,
) -> Tuple[np.ndarray, Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Finest-resolution Reynolds-stress profiles along ``geom.raxis``.

    Matches the reference two-pass algorithm
    (reference: fava/mesh/FLASH/_flash.py:1506-1611): layer means of
    dens/vel, then density-weighted velocity covariances, both
    normalized by layer volume (cross-section x finest cell width).
    """
    ndim = geom.ndim
    nvel = ndim
    axes = AXES_NAMES[:ndim]

    layer_volume_u = geom.layer_area * geom.min_deltas[geom.raxis]
    if _is_uniform_fast_case(data, geom):
        d_row, v_rows, cov, c1, means_rows = _uniform_centered_stats(data, geom)
        vol = float(geom.vol_fracs[0])
        scale = vol / layer_volume_u
        # whole-array fetches (per-row slices each pay the ~27 ms
        # tunnel dispatch floor)
        d_h = np.asarray(d_row, dtype=np.float64)
        v_h = np.asarray(v_rows, dtype=np.float64)
        cov_h = np.asarray(cov, dtype=np.float64)
        means: Dict[str, np.ndarray] = {"dens": d_h * scale}
        for i, a in enumerate(axes):
            means[f"vel{a}"] = v_h[i] * scale
        stress: Dict[str, np.ndarray] = {}
        for p, (i, j) in enumerate(_pair_indices(3)):
            stress[f"R{axes[i]}{axes[j]}"] = cov_h[p] * scale
        return geom.span.copy(), stress, means

    prof_raw, cen_groups, scales = _grouped_stats(data, geom)

    layer_volume = geom.layer_area * geom.min_deltas[geom.raxis]

    means: Dict[str, np.ndarray] = {"dens": prof_raw[0] / layer_volume}
    for i, a in enumerate(axes):
        means[f"vel{a}"] = prof_raw[1 + i] / layer_volume

    ref_fine = jnp.asarray(np.stack([means[f"vel{a}"] for a in axes]), dtype=accum_dtype())
    cov = np.asarray(
        _scatter_centered_pairs(cen_groups, scales, geom.nfine, ref_fine, nvel),
        dtype=np.float64,
    )
    stress: Dict[str, np.ndarray] = {}
    for p, (i, j) in enumerate(_pair_indices(nvel)):
        stress[f"R{axes[i]}{axes[j]}"] = cov[p] / layer_volume

    return geom.span.copy(), stress, means


def favre_profiles(
    data: Dict[str, jax.Array],
    geom: ProfileGeometry,
) -> Dict[str, np.ndarray | Dict[str, np.ndarray]]:
    """Favre (density-weighted) mean profiles and mass-weighted RMS fluctuations.

    Not present in the reference (BASELINE config #3 requires it):
      favre_mean v~_i = <rho v_i> / <rho>
      favre_rms  v''_i = sqrt(<rho (v_i - v~_i)^2> / <rho>)
    computed from the same fused moments as reynolds_stress.
    """
    ndim = geom.ndim
    nvel = ndim
    axes = AXES_NAMES[:ndim]
    layer_volume_u = geom.layer_area * geom.min_deltas[geom.raxis]

    if _is_uniform_fast_case(data, geom):
        d_row, v_rows, cov, c1, means_rows = _uniform_centered_stats(data, geom)
        vol = float(geom.vol_fracs[0])
        scale = vol / layer_volume_u
        # whole-array fetches (per-row slices each pay the ~27 ms
        # tunnel dispatch floor)
        d64 = np.asarray(d_row, dtype=np.float64)
        means_h = np.asarray(means_rows, dtype=np.float64)
        c1_h = np.asarray(c1, dtype=np.float64)
        cov_h = np.asarray(cov, dtype=np.float64)
        safe_d = np.where(d64 > 0, d64, 1.0)
        pairs3 = _pair_indices(3)
        out: Dict[str, np.ndarray | Dict[str, np.ndarray]] = {
            "span": geom.span.copy(),
            "mean_dens": d64 * scale,
            "favre_mean": {},
            "favre_rms": {},
        }
        for i, a in enumerate(axes):
            # mu + sum(d*(v-mu))/sum(d): exact identity, conditioned
            # where the raw sum(d*v) cancels (zero-mean velocities).
            fmean = means_h[i] + c1_h[i] / safe_d
            di = fmean - means_h[i]
            p = pairs3.index((i, i))
            var = (cov_h[p] - 2.0 * di * c1_h[i] + di * di * d64) / safe_d
            out["favre_mean"][f"vel{a}"] = fmean
            out["favre_rms"][f"vel{a}"] = np.sqrt(np.maximum(var, 0.0))
        return out

    prof_raw, cen_groups, scales = _grouped_stats(data, geom)

    layer_volume = geom.layer_area * geom.min_deltas[geom.raxis]
    d0 = prof_raw[0]
    dv = prof_raw[1 + nvel : 1 + 2 * nvel]
    pairs = _pair_indices(nvel)

    safe_d = np.where(d0 > 0, d0, 1.0)
    fmeans = np.stack([dv[i] / safe_d for i in range(nvel)])
    # Centered scatter against the Favre means: diagonal entries are
    # the mass-weighted variance numerators sum(d*(v_i - v~_i)^2).
    cov = np.asarray(
        _scatter_centered_pairs(
            cen_groups, scales, geom.nfine, jnp.asarray(fmeans, dtype=accum_dtype()), nvel
        ),
        dtype=np.float64,
    )
    out: Dict[str, np.ndarray | Dict[str, np.ndarray]] = {
        "span": geom.span.copy(),
        "mean_dens": d0 / layer_volume,
        "favre_mean": {},
        "favre_rms": {},
    }
    for i, a in enumerate(axes):
        p = pairs.index((i, i))
        var = cov[p] / safe_d
        out["favre_mean"][f"vel{a}"] = fmeans[i]
        out["favre_rms"][f"vel{a}"] = np.sqrt(np.maximum(var, 0.0))
    return out


def slice_integral(
    field_data: jax.Array,
    geom: ProfileGeometry,
) -> Tuple[np.ndarray, np.ndarray]:
    """Finest-resolution axis profile of sum(field * vol_frac) per layer.

    (reference: fava/mesh/FLASH/_flash.py:1451-1504; the reference
    hard-codes the reduction to axis 0 via einsum("ijk->i") — here the
    reduction honors ``geom.raxis``, which is identical for raxis=0.)
    """
    blk = jnp.asarray(geom.blocklist)
    fields = (jnp.take(field_data, blk, axis=0),)
    moments = _row_moments(fields, raxis=geom.raxis, nvel=0)
    groups, scales = geom.device_groups(moments)
    prof = np.asarray(_scatter_groups(groups, scales, geom.nfine), dtype=np.float64)
    return geom.span.copy(), prof[0]


def slice_average(
    field_data: jax.Array,
    geom: ProfileGeometry,
) -> Tuple[np.ndarray, np.ndarray]:
    """slice_integral normalized by layer volume (reference: _flash.py:1427-1449)."""
    span, alp = slice_integral(field_data, geom)
    layer_volume = geom.layer_area * geom.min_deltas[geom.raxis]
    return span, alp / layer_volume


# Velocity-pair order shared by every profile consumer: xx,xy,xz,yy,yz,zz.
VEL_PAIRS: Tuple[Tuple[int, int], ...] = tuple(
    (i, j) for i in range(3) for j in range(i, 3)
)
_DIAG = tuple(VEL_PAIRS.index((i, i)) for i in range(3))


def assemble_profile_stats(d_row, means, c1, cov, layer):
    """Reynolds stress + Favre mean/RMS from centered per-bin moments.

    One definition for the three call sites (single-chip flagship,
    sharded flagship, streamed out-of-core) so conditioning fixes land
    everywhere at once. Inputs are stacked rows: d_row (nx,), means
    (3, nx) volume-mean velocities, c1 (3, nx) = sum(d*(v-mu)),
    cov (6, nx) = sum(d*ci*cj) in VEL_PAIRS order, layer = cells/bin.

    favre_mean = mu + c1/sum(d) exactly, conditioned where the raw
    sum(d*v) cancels (near-zero-mean velocities); the RMS variance is
    the centered covariance shifted to the Favre mean.
    """
    stress = cov / layer
    # Same zero-density conditioning as the favre_profiles siblings: a
    # vacuum bin (sum(d) == 0) has c1 == cov == 0, so dividing by the
    # guarded 1 yields favre_mean == means and rms == 0 instead of NaN.
    safe_d = jnp.where(d_row > 0, d_row, jnp.ones_like(d_row))
    favre_mean = means + c1 / safe_d
    di = favre_mean - means
    diag_cov = jnp.stack([cov[d] for d in _DIAG])
    var = (diag_cov - 2.0 * di * c1 + di * di * d_row) / safe_d
    favre_rms = jnp.sqrt(jnp.maximum(var, 0.0))
    return stress, favre_mean, favre_rms
