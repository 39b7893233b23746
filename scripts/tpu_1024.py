"""1024^3 single-chip readiness run (VERDICT round-2 item 10).

A 1024^3 f32 snapshot (4 fields = 17 GB + FFT temporaries) cannot be
device-resident on one 16 GB v5e, so this runs the streamed out-of-core
path (ops/outofcore.py): one host->device pass building the
zy-transformed spectra buffers + single-pass profile moments, then
kx-chunked x-DFT + shell binning on device. Records wall-clock and a
small-volume correctness cross-check into BENCH_1024.json.

    python scripts/tpu_1024.py [n] [slab_rows] [chunk_rows]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def synth_slab(name: str, x0: int, x1: int, n: int) -> np.ndarray:
    """Deterministic trig fields, computed per-slab on host (f32)."""
    x = (np.arange(x0, x1, dtype=np.float32) / n)[:, None, None]
    y = (np.arange(n, dtype=np.float32) / n)[None, :, None]
    z = (np.arange(n, dtype=np.float32) / n)[None, None, :]
    two_pi = np.float32(2.0 * np.pi)

    def mix(a, b, c, p):
        return (
            np.sin(two_pi * (a * x + b * y + c * z) + p)
            + 0.5 * np.cos(two_pi * (b * x + c * y + a * z) + 2 * p)
        ).astype(np.float32)

    if name == "dens":
        return (1.3 + 0.3 * np.cos(two_pi * (x + 2 * y - z)) * np.sin(two_pi * (3 * x - y))).astype(
            np.float32
        ) * np.ones((1, n, n), dtype=np.float32)
    comp = {"velx": (3, 7, 2, 0.3), "vely": (5, 1, 6, 1.1), "velz": (2, 4, 9, 2.7)}[name]
    return mix(*comp)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fava_tpu import utils as futils
    from fava_tpu.ops.outofcore import streamed_uniform_analysis

    futils.enable_compilation_cache(str(ROOT / ".jax_cache"))
    futils.timing.VERBOSE = False

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    slab_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    chunk_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    results = {
        "platform": jax.devices()[0].platform,
        "n": n,
        "slab_rows": slab_rows,
        "chunk_rows": chunk_rows,
        "mode": "streamed out-of-core (ops/outofcore.py)",
    }

    # In-core feasibility note: 4 fields + 3 complex spectra at n^3.
    field_gb = 4 * n**3 / 1e9
    results["incore_estimate_gb"] = round(4 * field_gb + 3 * 2 * field_gb * ((n // 2 + 1) / n), 1)

    def loader(name, x0, x1):
        return synth_slab(name, x0, x1, n)

    out_path = ROOT / "BENCH_1024.json"
    print(f"streamed {n}^3 (slab={slab_rows}, chunk={chunk_rows})...", flush=True)
    t0 = time.perf_counter()
    out = streamed_uniform_analysis(loader, (n, n, n), slab_rows=slab_rows, chunk_rows=chunk_rows)
    wall = time.perf_counter() - t0
    results["wall_s_first"] = wall
    results["spectra_total_head"] = [float(v) for v in out["spectra_total"][:4]]
    results["total_mass"] = float(out["total_mass"])
    assert np.isfinite(out["spectra_total"]).all()
    assert np.isfinite(out["reynolds_stress"]).all()
    out_path.write_text(json.dumps(results, indent=2))
    print(f"first call (incl compile): {wall:.1f} s", flush=True)

    if wall < 600:
        t0 = time.perf_counter()
        out = streamed_uniform_analysis(
            loader, (n, n, n), slab_rows=slab_rows, chunk_rows=chunk_rows
        )
        wall = time.perf_counter() - t0
        results["wall_s"] = wall
        print(f"warm call: {wall:.1f} s", flush=True)

    out_path.write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
