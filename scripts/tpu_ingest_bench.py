"""HDF5 -> HBM ingest bandwidth on the TPU host (BASELINE tracked metric).

Writes N synthetic 256^3 uniform snapshots to a scratch dir, then
measures:
  * SnapshotPrefetcher end-to-end GB/s (read + axis swap + device_put),
    at depths 1 (synchronous) and 2/4 (double-buffered),
  * native (C++) vs NumPy axis-swap+cast throughput on one field.

Writes INGEST.json at the repo root.

    python scripts/tpu_ingest_bench.py [nfiles] [n]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    import jax

    from fava_tpu import native
    from fava_tpu.io import synthetic
    from fava_tpu.io.ingest import SnapshotPrefetcher, ingest_bandwidth_gbps

    nfiles = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    fields = ["dens", "velx", "vely", "velz"]

    results = {
        "platform": jax.devices()[0].platform,
        "nfiles": nfiles,
        "ncells": n,
        "fields": fields,
    }

    scratch = Path(tempfile.mkdtemp(prefix="fava_ingest_"))
    try:
        print(f"writing {nfiles} x {n}^3 uniform files...", flush=True)
        t0 = time.perf_counter()
        paths = []
        for i in range(1, nfiles + 1):
            paths.append(
                synthetic.make_uniform_file(
                    scratch / f"ig_hdf5_uniform_{i:04d}", ncells=(n, n, n), seed=i
                )
            )
        results["write_s"] = time.perf_counter() - t0
        per_file_bytes = 4 * len(fields) * n**3  # f32 on device
        results["per_file_gb"] = per_file_bytes / 1e9
        print(f"wrote in {results['write_s']:.1f}s", flush=True)

        # Warm one load (opens libtpu path, builds native lib if needed).
        for _ in SnapshotPrefetcher(paths[:1], fields, depth=1):
            pass

        for depth in (1, 2, 4):
            gbps = ingest_bandwidth_gbps(paths, fields, depth=depth)
            results[f"ingest_gbps_depth{depth}"] = gbps
            print(f"ingest depth={depth}: {gbps:.2f} GB/s", flush=True)

        # bf16 wire format (opt-in): cast on host, transfer half the
        # bytes, widen on device. Reported as EFFECTIVE field GB/s
        # (f32 field bytes delivered per second) for comparability.
        import jax.numpy as jnp

        t0 = time.perf_counter()
        moved = 0
        for snap in SnapshotPrefetcher(paths, fields, depth=2, wire_dtype=jnp.bfloat16):
            moved += snap.nbytes  # wire (bf16) bytes
            for arr in snap.fields.values():
                np.asarray(jax.device_get(arr.ravel()[:1]))
        dt = time.perf_counter() - t0
        results["ingest_bf16_wire_gbps"] = moved / dt / 1e9
        results["ingest_bf16_effective_gbps"] = 2 * moved / dt / 1e9
        print(
            f"ingest bf16 wire: {results['ingest_bf16_wire_gbps']:.3f} GB/s wire, "
            f"{results['ingest_bf16_effective_gbps']:.3f} GB/s effective",
            flush=True,
        )

        # Component breakdown on one snapshot: disk read, swap+cast
        # (NumPy vs native C++), host->device transfer.
        import h5py

        t0 = time.perf_counter()
        with h5py.File(paths[0], "r") as f:
            raw = f["dens"][()]  # (nz, ny, nx) float64 on disk
        results["disk_read_s"] = time.perf_counter() - t0
        results["disk_read_gbps"] = raw.nbytes / results["disk_read_s"] / 1e9
        print(f"disk read: {results['disk_read_gbps']:.2f} GB/s", flush=True)
        reps = 3

        t_np = min(
            _time_once(lambda: np.ascontiguousarray(raw.swapaxes(-1, -3), dtype=np.float32))
            for _ in range(reps)
        )
        results["transpose_numpy_s"] = t_np
        results["transpose_numpy_gbps"] = raw.nbytes / t_np / 1e9

        if native.native_available():
            t_nat = min(
                _time_once(lambda: native.swap_axes_cast(raw, np.float32)) for _ in range(reps)
            )
            results["transpose_native_s"] = t_nat
            results["transpose_native_gbps"] = raw.nbytes / t_nat / 1e9
            results["transpose_speedup"] = t_np / t_nat
            ok = np.array_equal(
                native.swap_axes_cast(raw, np.float32),
                np.ascontiguousarray(raw.swapaxes(-1, -3), dtype=np.float32),
            )
            results["transpose_native_matches"] = bool(ok)
            print(
                f"transpose: numpy {results['transpose_numpy_gbps']:.2f} GB/s, "
                f"native {results['transpose_native_gbps']:.2f} GB/s "
                f"({results['transpose_speedup']:.1f}x, match={ok})",
                flush=True,
            )
        else:
            print("native transpose unavailable", flush=True)

        # Pure host->device bandwidth through the runtime (f32 volume).
        host32 = np.ascontiguousarray(raw.swapaxes(-1, -3), dtype=np.float32)
        import jax.numpy as jnp

        def put():
            arr = jax.device_put(host32)
            arr.block_until_ready()
            float(jnp.sum(arr[:1, :1, :8]).block_until_ready().item())

        t_put = min(_time_once(put) for _ in range(reps))
        results["device_put_s"] = t_put
        results["device_put_gbps"] = host32.nbytes / t_put / 1e9
        print(f"device_put: {results['device_put_gbps']:.2f} GB/s", flush=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    (ROOT / "INGEST.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


def _time_once(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
