"""AMR -> uniform regridding as a single on-device gather.

TPU-native redesign of the reference ``from_amr`` prolongation
(reference: fava/mesh/FLASH/_flash.py:955-1377), whose inner loop
builds a Python dict mapping every fine cell to a (leaf, i, j, k)
source and copies cell-by-cell — the slowest path in the package
(SURVEY §3.3). Here the mapping is closed-form:

  output fine cell g (global fine-index space at the target level)
   -> finest-block-grid coords fb = g // ncells_per_block
   -> block = leaf_table[fbx, fby, fbz]       (small int32 lookup table)
   -> source cell c = (g - block_offset) // 2**(lmax - block_level)

so the entire regrid is integer arithmetic + one flat gather from the
HBM-resident block stack: no loops, jittable, and trivially sharded
over the output volume (each device gathers its slab).

Injection prolongation (cell replication) exactly matches the
reference's 2^(level-diff) mapping. The integer BCID arithmetic
(truncation included) replicates _flash.py:1004-1022 so subdomain
cropping lands on identical cell boundaries.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MESH_MDIM = 3


class RegridPlan:
    """Host-precomputed tables mapping the fine grid onto source blocks."""

    def __init__(
        self,
        *,
        block_bounds: np.ndarray,  # (nB, 3, 2)
        node_type: np.ndarray,
        refine_level: np.ndarray,
        ncells_vec: np.ndarray,  # (3,)
        nblks_vec: np.ndarray,  # (3,)
        ndim: int,
        refine_to: int = -1,
        subdomain_coords: Optional[np.ndarray] = None,
    ) -> None:
        block_bounds = np.asarray(block_bounds, dtype=np.float64)
        node_type = np.asarray(node_type)
        refine_level = np.asarray(refine_level).astype(np.int64)
        ncells_vec = np.asarray(ncells_vec, dtype=np.int64)
        nblks_vec = np.asarray(nblks_vec, dtype=np.int64)
        self.ndim = int(ndim)

        lmax_global = int(refine_level.max())
        ref_lev = min(int(refine_to), lmax_global)
        lmax = ref_lev if ref_lev > 0 else lmax_global
        self.lref_max = lmax

        # Global grid bounding box from block extents (reference :1000-1002).
        grid_box = np.zeros((MESH_MDIM, 2), dtype=np.float64)
        grid_box[:, 0] = block_bounds[..., 0].min(axis=0)
        grid_box[:, 1] = block_bounds[..., 1].max(axis=0)
        self.grid_box = grid_box

        cellfac = 2 ** (lmax - 1)
        self.grid_delta = (grid_box[:, 1] - grid_box[:, 0]) / (ncells_vec * nblks_vec * cellfac)

        # Per-block fine-cell index boxes, truncating float math like the
        # reference (reference :1010-1015).
        half = 0.5 * self.grid_delta
        bcids = (
            (block_bounds - grid_box[:, 0, None] + half[None, :, None])
            / self.grid_delta[None, :, None]
        ).astype(np.int32)
        self.block_offsets = bcids[:, :, 0].astype(np.int64)
        # Exponent clipped at 0: blocks finer than the target level are
        # never selected by the lookup table.
        self.block_scales = 2 ** np.maximum(lmax - refine_level, 0)

        # Reference sentinel (_flash.py:965): the subdomain is active if
        # ANY axis row contains no zero — rows touching 0.0 are fine
        # (e.g. a transverse crop [0, 1]); only a box whose every row
        # touches zero reads as the "whole domain" sentinel. An all()
        # here silently regridded the full domain whenever one
        # transverse bound was 0.0 (2048x512x512 instead of 512^3 in
        # the pipeline's flame window -> OOM at scale).
        subdomain_flag = subdomain_coords is not None and any(
            0 not in np.asarray(sdc) for sdc in np.asarray(subdomain_coords)
        )
        self.subdomain_flag = subdomain_flag

        sub_bcids = np.zeros((MESH_MDIM, 2), dtype=np.int32)
        if subdomain_flag:
            sc = np.asarray(subdomain_coords, dtype=np.float64)
            sub_bcids[:] = (0.5 + (sc - grid_box[:, :1]) / self.grid_delta[:, None]).astype(np.int32)
        self.sub_bcids = sub_bcids

        fine_blks = cellfac * nblks_vec
        total_cells = np.ones(MESH_MDIM, dtype=np.int64)
        if subdomain_flag:
            total_cells[:ndim] = np.diff(sub_bcids[:ndim]).ravel()
            self.out_origin = sub_bcids[:, 0].astype(np.int64)
            self.domain_box = grid_box[:, :1] + sub_bcids * self.grid_delta[:, None]
        else:
            total_cells[:ndim] = fine_blks[:ndim] * ncells_vec[:ndim]
            self.out_origin = np.zeros(MESH_MDIM, dtype=np.int64)
            self.domain_box = grid_box.copy()
        self.total_cells = total_cells

        # Source-block selection (reference :1157-1182): with a target
        # level, leaves above it plus any block exactly at it; otherwise
        # plain leaves. Optionally restricted to subdomain intersection.
        is_leaf = node_type == 1
        if ref_lev > 0:
            maybe = (is_leaf & (refine_level < ref_lev)) | (refine_level == ref_lev)
        else:
            maybe = is_leaf

        if subdomain_flag:
            for n in range(ndim):
                maybe &= (sub_bcids[n, 0] <= bcids[:, n, 1]) & (bcids[:, n, 0] <= sub_bcids[n, 1])

        self.source_ids = np.nonzero(maybe)[0].astype(np.int64)

        # Lookup table at finest-block granularity: which block covers
        # each (ncells-sized) tile of the fine grid.
        self.ncells_vec = ncells_vec
        tbl_shape = tuple(int(fine_blks[a]) if a < ndim else 1 for a in range(MESH_MDIM))
        tbl_cells = int(np.prod(tbl_shape))
        if tbl_cells > 512**3:
            raise MemoryError(
                f"Regrid lookup table would need {tbl_cells} entries "
                f"({tbl_shape} fine-block tiles). Crop with subdomain_coords "
                f"or truncate with refine_level for very deep AMR trees."
            )
        table = -np.ones(tbl_shape, dtype=np.int32)
        for b in self.source_ids:
            s = int(self.block_scales[b])
            o = self.block_offsets[b]
            sl = []
            for a in range(MESH_MDIM):
                if a < ndim:
                    b0 = int(o[a]) // int(ncells_vec[a])
                    sl.append(slice(b0, b0 + s))
                else:
                    sl.append(slice(0, 1))
            table[tuple(sl)] = b
        self.leaf_table = table

    @property
    def out_shape(self) -> Tuple[int, int, int]:
        return tuple(int(c) for c in self.total_cells)


@lru_cache(maxsize=16)
def _build_gather_fns(out_shape, ncells, origin, block_shape, nb_total=None):
    """Jitted flat-index computation + per-field gather (cached per geometry)."""
    nx, ny, nz = out_shape
    ncx, ncy, ncz = ncells
    ox, oy, oz = origin
    bx, by, bz = block_shape
    # The flat gather index is computed in int32 when x64 is off (TPU
    # production): jnp.take would silently clamp a wrapped-negative
    # index to 0, filling regions with block 0's first cell. Refuse
    # loudly instead; such trees must crop/truncate (like the lookup
    # table guard above).
    if nb_total is not None and int(nb_total) * bx * by * bz > np.iinfo(np.int32).max:
        raise MemoryError(
            f"Regrid gather index space {int(nb_total) * bx * by * bz} exceeds int32; "
            "crop with subdomain_coords or truncate with refine_level."
        )

    @jax.jit
    def flat_indices(leaf_table, offsets, scales):
        gx = (jnp.arange(nx) + ox)[:, None, None]
        gy = (jnp.arange(ny) + oy)[None, :, None]
        gz = (jnp.arange(nz) + oz)[None, None, :]
        blkid = leaf_table[gx // ncx, gy // ncy, gz // ncz]
        safe = jnp.maximum(blkid, 0)
        s = scales[safe]
        cx = jnp.clip((gx - offsets[safe, 0]) // s, 0, bx - 1)
        cy = jnp.clip((gy - offsets[safe, 1]) // s, 0, by - 1)
        cz = jnp.clip((gz - offsets[safe, 2]) // s, 0, bz - 1)
        flat = ((safe * bx + cx) * by + cy) * bz + cz
        return flat, blkid >= 0

    @jax.jit
    def gather(field, flat, valid):
        out = jnp.take(field.reshape(-1), flat.reshape(-1)).reshape(out_shape)
        return jnp.where(valid, out, 0)

    return flat_indices, gather


class ShardedRegridPlan:
    """Host-side block distribution for a mesh-sharded regrid.

    The output volume is slab-sharded along x over the ``space`` axis;
    each device receives ONLY the source blocks its slab reads (plus
    boundary overlap), so multi-chip HBM capacity pools for the input
    block stack instead of replicating it (round-1 gap: every device
    gathered from the full stack). Addresses reference
    _flash.py:1262-1321 at pod scale.
    """

    def __init__(self, plan: RegridPlan, n_space: int) -> None:
        nx = plan.out_shape[0]
        if nx % n_space != 0:
            # A ValueError, not an assert: under ``python -O`` the
            # assert strips and ``nxs = nx // n_space`` silently
            # truncates into a wrong block distribution. The production
            # caller (mesh/flash_amr.py from_amr) checks eligibility
            # and falls back to the replicated path; this guards direct
            # regrid_fields_sharded use.
            raise ValueError(
                f"sharded regrid needs the output x extent ({nx}) to divide "
                f"the space axis ({n_space}); crop/pad the subdomain or use "
                "the unsharded regrid_fields"
            )
        self.plan = plan
        self.n_space = n_space
        self.nxs = nx // n_space
        ncx = int(plan.ncells_vec[0])
        ox = int(plan.out_origin[0])

        table = plan.leaf_table
        nb_total = len(plan.block_scales)
        dev_ids = []
        for d in range(n_space):
            r0 = (d * self.nxs + ox) // ncx
            r1 = ((d + 1) * self.nxs - 1 + ox) // ncx
            sub = table[r0 : r1 + 1]
            ids = np.unique(sub[sub >= 0])
            dev_ids.append(ids.astype(np.int64))
        self.bmax = max(1, max(ids.size for ids in dev_ids))
        self.block_ids = np.zeros((n_space, self.bmax), dtype=np.int64)
        # Global block id -> position in the device-local stack.
        self.remap = np.zeros((n_space, max(1, nb_total)), dtype=np.int32)
        for d, ids in enumerate(dev_ids):
            self.block_ids[d, : ids.size] = ids
            self.remap[d, ids] = np.arange(ids.size, dtype=np.int32)

    def place_stack(self, host_stack: np.ndarray, mesh, axis_name: str) -> jax.Array:
        """Per-device block subsets, placed straight from host memory."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(axis_name))
        shape = (self.n_space * self.bmax,) + tuple(host_stack.shape[1:])
        ids = self.block_ids

        def cb(index):
            lo = index[0].start or 0
            d = lo // self.bmax
            return host_stack[ids[d]]

        return jax.make_array_from_callback(shape, sharding, cb)


def regrid_fields_sharded(
    plan: RegridPlan,
    host_stacks: Dict[str, np.ndarray],
    fields: Sequence[str],
    mesh,
    axis_name: str = "space",
) -> Dict[str, jax.Array]:
    """Mesh-sharded regrid: local gather from per-device block subsets.

    Each device holds its output x-slab and only the source blocks that
    slab reads. One shard_map, no collectives: block distribution and
    index remapping are precomputed on host.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_space = mesh.shape[axis_name]
    splan = ShardedRegridPlan(plan, n_space)
    nx, ny, nz = plan.out_shape
    nxs = splan.nxs
    ncx, ncy, ncz = (int(c) for c in plan.ncells_vec)
    ox, oy, oz = (int(o) for o in plan.out_origin)
    first = host_stacks[fields[0]]
    bx, by, bz = (int(s) for s in first.shape[1:])
    bmax = splan.bmax
    # Same int32 flat-index guard as _build_gather_fns: jnp.take would
    # silently clamp a wrapped-negative index to block 0's first cell.
    # The device-local stack is bmax blocks wide, so that is the bound.
    if bmax * bx * by * bz > np.iinfo(np.int32).max:
        raise MemoryError(
            f"Sharded regrid gather index space {bmax * bx * by * bz} exceeds int32; "
            "crop with subdomain_coords or truncate with refine_level."
        )

    leaf_table = jnp.asarray(plan.leaf_table)
    offsets = jnp.asarray(plan.block_offsets)
    scales = jnp.asarray(plan.block_scales)
    remap = jnp.asarray(splan.remap)

    # The plan tables are passed as (replicated) arguments, not closure
    # captures, so the jitted shard_map is cached across snapshots of
    # the same geometry (pipeline stage 3 regrids one window per plt
    # file — a fresh closure per call would retrace every time).
    gather = _build_sharded_gather_fn(
        mesh, axis_name, (nxs, ny, nz), (ox, oy, oz), (ncx, ncy, ncz), (bx, by, bz)
    )

    remap_dev = jax.device_put(remap, NamedSharding(mesh, P(axis_name)))
    leaf_dev = jax.device_put(leaf_table, NamedSharding(mesh, P()))
    off_dev = jax.device_put(offsets, NamedSharding(mesh, P()))
    sc_dev = jax.device_put(scales, NamedSharding(mesh, P()))
    out = {}
    for name in fields:
        stack = splan.place_stack(np.asarray(host_stacks[name]), mesh, axis_name)
        out[name] = gather(stack, remap_dev, leaf_dev, off_dev, sc_dev)
    return out


@lru_cache(maxsize=16)
def _build_sharded_gather_fn(mesh, axis_name, out_dims, origin, ncells, block_dims):
    """Cached jitted shard_map gather for one regrid geometry."""
    from jax.sharding import PartitionSpec as P

    nxs, ny, nz = out_dims
    ox, oy, oz = origin
    ncx, ncy, ncz = ncells
    bx, by, bz = block_dims

    def local(stack_loc, remap_loc, leaf_table, offsets, scales):
        d = jax.lax.axis_index(axis_name)
        gx = (d * nxs + jnp.arange(nxs) + ox)[:, None, None]
        gy = (jnp.arange(ny) + oy)[None, :, None]
        gz = (jnp.arange(nz) + oz)[None, None, :]
        blkid = leaf_table[gx // ncx, gy // ncy, gz // ncz]
        safe = jnp.maximum(blkid, 0)
        s = scales[safe]
        cx = jnp.clip((gx - offsets[safe, 0]) // s, 0, bx - 1)
        cy = jnp.clip((gy - offsets[safe, 1]) // s, 0, by - 1)
        cz = jnp.clip((gz - offsets[safe, 2]) // s, 0, bz - 1)
        local_id = remap_loc[0, safe]
        flat = ((local_id * bx + cx) * by + cy) * bz + cz
        out = jnp.take(stack_loc.reshape(-1), flat.reshape(-1)).reshape((nxs, ny, nz))
        return jnp.where(blkid >= 0, out, 0)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(), P(), P()),
            out_specs=P(axis_name, None, None),
        )
    )


def regrid_fields(
    plan: RegridPlan,
    data: Dict[str, jax.Array],
    fields: Sequence[str],
    sharding=None,
) -> Dict[str, jax.Array]:
    """Regrid each field's (nblocks, nx, ny, nz) stack to the uniform grid.

    The flat gather indices are computed once and reused for every
    field (replaces the reference's per-field dict-copy loop,
    _flash.py:1262-1321). With ``sharding`` set, the index volume (and
    hence every output field) is slab-sharded over the device mesh.
    On single-chip TPU with power-of-two blocks, the tile-DMA Pallas
    kernel (ops/pallas_regrid.py) replaces the gather.
    """
    first = data[fields[0]]
    block_shape = tuple(int(s) for s in first.shape[1:])

    if sharding is None and first.ndim == 4:
        from fava_tpu.ops import pallas_regrid

        max_scale = (
            int(plan.block_scales[plan.source_ids].max()) if len(plan.source_ids) else 1
        )
        if pallas_regrid.regrid_tiles_supported(block_shape, max_scale):
            return pallas_regrid.regrid_fields_pallas(plan, data, fields)

    flat_fn, gather_fn = _build_gather_fns(
        plan.out_shape,
        tuple(int(c) for c in plan.ncells_vec),
        tuple(int(o) for o in plan.out_origin),
        block_shape,
        nb_total=int(first.shape[0]),
    )

    flat, valid = flat_fn(
        jnp.asarray(plan.leaf_table),
        jnp.asarray(plan.block_offsets),
        jnp.asarray(plan.block_scales),
    )
    if sharding is not None:
        flat = jax.device_put(flat, sharding)
        valid = jax.device_put(valid, sharding)

    return {name: gather_fn(data[name], flat, valid) for name in fields}
