"""Device-mesh runtime.

The reference parallelizes with an MPI singleton over node-local
shared-memory windows (reference: fava/util/_mpi.py:17-80): every rank
sees one copy of each big array and collectives reduce small profiles.
The TPU-native equivalent is single-controller JAX: big arrays are
``jax.Array``s resident in HBM, sharded over a ``jax.sharding.Mesh``;
"shared windows" become a single global array, and ``Allreduce`` becomes
``psum`` over ICI inside jitted/shard_mapped code.

This module owns the global mesh used by the analysis kernels. With one
device (or no mesh configured) everything runs unsharded; with a mesh,
volumes are slab-sharded along the leading axis ("space") and snapshot
batches can additionally shard over a "snap" axis.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

SPACE_AXIS = "space"
SNAP_AXIS = "snap"

_MESH: Optional[Mesh] = None


def device_count() -> int:
    return len(jax.devices())


def make_device_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (SPACE_AXIS,),
) -> Mesh:
    """Build a Mesh over the available devices.

    With no ``shape``, all devices go on a single named axis (default
    "space" — the spatial slab axis used by the analysis kernels).
    """
    if shape is None:
        shape = (device_count(),)
    devices = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(tuple(shape))
    return Mesh(devices, tuple(axis_names))


def set_mesh(mesh: Optional[Mesh]) -> None:
    global _MESH
    _MESH = mesh


def get_mesh() -> Optional[Mesh]:
    return _MESH


@contextmanager
def use_mesh(mesh: Optional[Mesh]):
    global _MESH
    prev = _MESH
    _MESH = mesh
    try:
        yield mesh
    finally:
        _MESH = prev


def space_axis_size(mesh: Optional[Mesh] = None) -> int:
    mesh = mesh if mesh is not None else _MESH
    if mesh is None or SPACE_AXIS not in mesh.axis_names:
        return 1
    return mesh.shape[SPACE_AXIS]


def volume_sharding(mesh: Optional[Mesh] = None, axis: int = 0, ndim: int = 3):
    """NamedSharding slab-sharding a volume along ``axis`` (None if no mesh)."""
    mesh = mesh if mesh is not None else _MESH
    if mesh is None or SPACE_AXIS not in mesh.axis_names:
        return None
    spec = [None] * ndim
    spec[axis] = SPACE_AXIS
    return NamedSharding(mesh, PartitionSpec(*spec))


def block_sharding(mesh: Optional[Mesh] = None, ndim: int = 4):
    """NamedSharding sharding an (nblocks, nx, ny, nz) stack along blocks."""
    mesh = mesh if mesh is not None else _MESH
    if mesh is None or SPACE_AXIS not in mesh.axis_names:
        return None
    spec = [None] * ndim
    spec[0] = SPACE_AXIS
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicated(mesh: Optional[Mesh] = None):
    mesh = mesh if mesh is not None else _MESH
    if mesh is None:
        return None
    return NamedSharding(mesh, PartitionSpec())


def shard_volume(x, mesh: Optional[Mesh] = None, axis: int = 0):
    """Put a host/device volume onto the mesh slab-sharded along ``axis``."""
    s = volume_sharding(mesh, axis=axis, ndim=np.ndim(x))
    if s is None:
        return jax.device_put(x)
    return jax.device_put(x, s)
