"""Async HDF5 -> HBM ingest pipeline.

The reference reads every snapshot synchronously on the MPI root into
shared windows (reference: fava/mesh/FLASH/_flash.py:306-341), stalling
all compute during I/O. Here a background thread pool reads snapshot
N+1 (and starts its host->device transfer) while the device computes on
snapshot N — double-buffered so the TPU never idles on the filesystem
(BASELINE north star: async ingest, config #3/#5).
"""

from __future__ import annotations

import concurrent.futures as cf
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, List, Sequence

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from fava_tpu.io import flash_file
from fava_tpu.utils import compute_dtype


@dataclass
class Snapshot:
    """One ingested snapshot: device-resident fields + host metadata."""

    path: Path
    time: float
    fields: Dict[str, jax.Array]
    scalars: Dict[str, Dict]
    runtime_parameters: Dict[str, Dict]
    metadata: Dict[str, np.ndarray]
    nbytes: int


def _read_snapshot(
    path: Path,
    fields: Sequence[str],
    sharding=None,
    strict: bool = True,
    wire_dtype=None,
) -> Snapshot:
    dtype = compute_dtype()
    wd = None if wire_dtype is None else jnp.dtype(wire_dtype)
    with h5py.File(path, "r") as f:
        scalars = flash_file.read_scalars(f)
        runtime = flash_file.read_runtime_parameters(f)
        meta = flash_file.read_block_metadata(f)
        available = flash_file.read_unknown_names(f)
        nbytes = 0
        device_fields: Dict[str, jax.Array] = {}
        for name in fields:
            if name not in available:
                # Silently dropping the field surfaces later as a bare
                # KeyError deep inside a consumer; name the file here
                # (strict=False restores the opportunistic skip).
                if strict:
                    raise KeyError(
                        f"field {name!r} not in {Path(path).name} "
                        f"(available: {sorted(available)})"
                    )
                continue
            host = flash_file.read_field(f, name, dtype=dtype)
            if wd is not None:
                # opt-in bf16 wire format: cast on host, widen on
                # device — halves bytes over a 0.035-0.045 GB/s tunnel
                # at the cost of bf16 rounding of the raw field
                host = host.astype(wd)
            nbytes += host.nbytes
            # device_put is async: the transfer overlaps the next read.
            # ``sharding`` may be a callback (name, shape) -> sharding so
            # shape-dependent placement (divisibility) is decided here
            # (see parallel.runtime.ingest_sharding_fn).
            s = sharding(name, host.shape) if callable(sharding) else sharding
            dev = jax.device_put(host, s) if s is not None else jax.device_put(host)
            if wd is not None:
                dev = dev.astype(dtype)
            device_fields[name] = dev
    return Snapshot(
        path=Path(path),
        time=float(scalars["real"].get("time", 0.0)),
        fields=device_fields,
        scalars=scalars,
        runtime_parameters=runtime,
        metadata=meta,
        nbytes=nbytes,
    )


class SnapshotPrefetcher:
    """Double-buffered iterator over a snapshot series.

    While the caller processes snapshot N, up to ``depth`` background
    workers read and device_put snapshots N+1..N+depth.
    """

    def __init__(
        self,
        paths: Sequence[str | Path],
        fields: Sequence[str],
        depth: int = 2,
        sharding=None,
        strict: bool = True,
        wire_dtype=None,
    ) -> None:
        self.paths = [Path(p) for p in paths]
        self.fields = list(fields)
        self.depth = max(1, int(depth))
        self.sharding = sharding
        self.strict = bool(strict)
        self.wire_dtype = wire_dtype

    def __len__(self) -> int:
        return len(self.paths)

    def __iter__(self) -> Iterator[Snapshot]:
        if not self.paths:
            return
        with cf.ThreadPoolExecutor(max_workers=self.depth) as pool:
            pending: List[cf.Future] = []
            for p in self.paths[: self.depth]:
                pending.append(
                    pool.submit(
                        _read_snapshot, p, self.fields, self.sharding, self.strict, self.wire_dtype
                    )
                )
            next_idx = self.depth
            try:
                while pending:
                    fut = pending.pop(0)
                    if next_idx < len(self.paths):
                        pending.append(
                            pool.submit(
                                _read_snapshot,
                                self.paths[next_idx],
                                self.fields,
                                self.sharding,
                                self.strict,
                                self.wire_dtype,
                            )
                        )
                        next_idx += 1
                    yield fut.result()
            finally:
                # An early-exiting or raising consumer must not leave
                # the prefetch window reading + device_put-ing whole
                # snapshots nobody will consume (minutes per snapshot
                # through a tunneled link, and the futures pin their
                # device buffers through the caller's recovery).
                for fut in pending:
                    fut.cancel()
                pending.clear()


def ingest_bandwidth_gbps(
    paths: Sequence[str | Path], fields: Sequence[str], depth: int = 2, wire_dtype=None
) -> float:
    """Measure HDF5 -> HBM ingest bandwidth over a series (GB/s).

    With ``wire_dtype`` the reported rate counts WIRE bytes (what moved
    over the link); the effective field GB/s is 2x that for bf16."""
    import time

    total = 0
    t0 = time.perf_counter()
    for snap in SnapshotPrefetcher(paths, fields, depth=depth, wire_dtype=wire_dtype):
        total += snap.nbytes
        # Sync by FETCHING a scalar from every array of every snapshot:
        # block_until_ready does not reliably synchronize on the axon
        # tunnel (CLAUDE.md), and awaiting only the last snapshot would
        # leave earlier transfers possibly in flight even on well-
        # behaved backends.
        for arr in snap.fields.values():
            # Leading-index slice, NOT ravel(): an eager ravel of a
            # multi-GB volume dispatches a full tiled-layout relayout
            # copy (plus its own ~27 ms round trip) inside the timed
            # region, charging non-ingest device work to the rate.
            np.asarray(jax.device_get(arr[(0,) * (arr.ndim - 1)][:1]))
    dt = time.perf_counter() - t0
    return total / dt / 1e9
