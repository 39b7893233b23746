"""Velocity structure functions (orders 1-10) on a uniform grid.

TPU-native redesign of the reference implementation
(reference: fava/mesh/FLASH/FlashUniform.py:306-447). The reference
loops over separations per MPI rank, drawing NumPy-random point pairs
into shared windows; here all (order, separation, point) samples are
drawn with a counter-based JAX PRNG and evaluated in one fused jitted
program — fresh samples per order, matching the reference's structure
(its sampling loop sits inside the order loop).

Semantics preserved exactly:
 * isotropic direction sampling via (phi, acos) angles,
 * periodic wrap of the second point (modulo == the reference's
   repeated domain-width shifts),
 * nearest-cell lookup by floor((p - lo)/dx),
 * longitudinal component |dv . rhat| with rhat from the *wrapped*
   separation vector, transverse = |dv - |dv.rhat| rhat|.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fava_tpu.utils import accum_dtype


@lru_cache(maxsize=16)
def _build_vsf_fn(num_seps: int, num_points: int, ndim: int, anisotropic: bool, vol_shape):
    @jax.jit
    def run(vels, separations, domain_lo, domain_width, cell_size, key):
        def one_order(okey, order):
            k1, k2, k3 = jax.random.split(okey, 3)
            shape = (num_seps, num_points)

            p1 = domain_lo + jax.random.uniform(k1, shape + (ndim,), dtype=domain_lo.dtype) * domain_width

            phi = 2.0 * jnp.pi * jax.random.uniform(k2, shape, dtype=domain_lo.dtype)
            theta = jnp.arccos(2.0 * jax.random.uniform(k3, shape, dtype=domain_lo.dtype) - 1.0)
            sep = separations[:, None]
            direction = jnp.stack(
                [
                    jnp.sin(theta) * jnp.cos(phi),
                    jnp.sin(theta) * jnp.sin(phi),
                    jnp.cos(theta),
                ],
                axis=-1,
            )[..., :ndim]
            p2 = p1 + sep[..., None] * direction
            # Periodic wrap (reference: FlashUniform.py:375-393).
            p2 = domain_lo + jnp.mod(p2 - domain_lo, domain_width)

            def cell_index(p):
                idx = jnp.floor((p - domain_lo) / cell_size).astype(jnp.int32)
                return jnp.clip(idx, 0, jnp.asarray(vol_shape[:ndim], dtype=jnp.int32) - 1)

            i1 = cell_index(p1)
            i2 = cell_index(p2)

            def sample(vol, idx):
                # ndim-generic tuple gather (no flat index: a 3D-only
                # flat computation crashed 2D data, and int32 flattening
                # would overflow beyond ~1290^3 cells).
                return vol[tuple(idx[..., a] for a in range(ndim))]

            dv = jnp.stack([sample(v, i2) - sample(v, i1) for v in vels], axis=-1)

            sep_vec = p2 - p1
            if anisotropic:
                rhat = jnp.zeros_like(sep_vec).at[..., 0].set(1.0)
            else:
                rhat = sep_vec / jnp.sqrt(jnp.sum(sep_vec**2, axis=-1, keepdims=True))

            long_comp = jnp.abs(jnp.sum(dv * rhat, axis=-1))
            long_dvel = long_comp[..., None] * rhat
            trans_comp = jnp.sqrt(jnp.sum((dv - long_dvel) ** 2, axis=-1))

            def vsf(comp):
                # (num_seps,): mean over points of comp^order.
                powed = comp ** order.astype(comp.dtype)
                return jnp.sum(powed.astype(accum_dtype()), axis=-1) / float(num_points)

            return vsf(long_comp), vsf(trans_comp)

        keys = jax.random.split(key, 10)
        orders = jnp.arange(1, 11)
        return jax.vmap(one_order)(keys, orders)

    return run


def structure_functions(
    vels: Sequence[jax.Array],
    *,
    domain_bounds: np.ndarray,
    num_seps: int = 100,
    num_points: int = 10000,
    sep_bounds: Optional[Sequence[float]] = None,
    log_scale: bool = True,
    anisotropic: bool = False,
    seed: int = 0,
) -> Dict[str, Dict[str, np.ndarray] | np.ndarray]:
    """Longitudinal/transverse velocity structure functions, orders 1-10.

    ``sep_bounds`` defaults to (smallest cell size, half the narrowest
    domain width) — the resolvable separation range. (The reference's
    default, (0, 1), crashes its own geomspace; SURVEY.md flags it as a
    latent bug not to replicate: reference FlashUniform.py:310-320.)
    """
    ndim = len(vels)
    vol_shape = tuple(int(s) for s in vels[0].shape)

    domain_bounds = np.asarray(domain_bounds, dtype=np.float64)
    lo = domain_bounds[:ndim, 0]
    width = domain_bounds[:ndim, 1] - domain_bounds[:ndim, 0]
    cell_size = width / np.asarray(vol_shape[:ndim], dtype=np.float64)

    if sep_bounds is None:
        sep_bounds = (float(cell_size.min()), float(width.min()) / 2.0)
    if log_scale and sep_bounds[0] <= 0.0:
        raise ValueError(
            f"sep_bounds lower bound must be positive with log_scale=True, got {sep_bounds[0]}"
        )
    if log_scale:
        separations = np.geomspace(sep_bounds[0], sep_bounds[1], num_seps)
    else:
        separations = np.linspace(sep_bounds[0], sep_bounds[1], num_seps)

    fn = _build_vsf_fn(int(num_seps), int(num_points), ndim, bool(anisotropic), vol_shape)
    dt = vels[0].dtype
    long_v, trans_v = fn(
        tuple(jnp.asarray(v) for v in vels),
        jnp.asarray(separations, dtype=dt),
        jnp.asarray(lo, dtype=dt),
        jnp.asarray(width, dtype=dt),
        jnp.asarray(cell_size, dtype=dt),
        jax.random.PRNGKey(seed),
    )
    long_v = np.asarray(long_v, dtype=np.float64)
    trans_v = np.asarray(trans_v, dtype=np.float64)

    vsfs: Dict[str, Dict[str, np.ndarray] | np.ndarray] = {"transverse": {}, "longitudinal": {}}
    for o in range(1, 11):
        vsfs["longitudinal"][f"{o}"] = long_v[o - 1]
        vsfs["transverse"][f"{o}"] = trans_v[o - 1]
    vsfs["separations"] = separations
    return vsfs
