"""1024^3 single-chip streamed velocity-gradient statistics record.

Measures ops/outofcore.streamed_gradient_stats at the beyond-HBM scale
(3 velocity fields = 12.9 GB f32; halo-extended x-slabs, per-slab
central moments on device, float64 Chan/Pebay combination on host) with
the same synthetic per-slab host loader as scripts/tpu_1024.py — the
wire, not the compute, is the expected critical path on this tunnel
(CLAUDE.md: device_put 0.035-0.045 GB/s). Records first + amortized
wall and the bf16 wire variant into GRAD_1024.json, plus a 128^3
same-loader cross-check against the in-core analysis.

    python scripts/tpu_grad_1024.py [n] [slab_rows]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from tpu_1024 import synth_slab  # noqa: E402  (same deterministic fields)


def main() -> None:
    import jax.numpy as jnp

    from fava_tpu import utils as futils
    from fava_tpu.ops.outofcore import streamed_gradient_stats

    futils.enable_compilation_cache(str(ROOT / ".jax_cache"))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    slab_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    def loader(name, x0, x1):
        return synth_slab(name, x0, x1, n)

    report = {"n": n, "slab_rows": slab_rows, "fields_gb": 3 * n**3 * 4 / 1e9}

    # small cross-check: streamed == in-core on the same synthetic fields
    import jax

    from fava_tpu.ops.gradients import velocity_gradient_statistics

    nc = 128
    small = streamed_gradient_stats(
        lambda f, a, b: synth_slab(f, a, b, nc), (nc, nc, nc), slab_rows=32
    )
    incore = velocity_gradient_statistics(
        *(jax.device_put(
            np.concatenate([synth_slab(f, i, i + 32, nc) for i in range(0, nc, 32)])
        ) for f in ("velx", "vely", "velz"))
    )
    report["crosscheck_128"] = {
        k: float(np.max(np.abs(np.asarray(small[k]) - np.asarray(incore[k]))))
        for k in ("derivative_skewness", "pseudo_dissipation", "enstrophy")
    }
    print("crosscheck:", report["crosscheck_128"], flush=True)

    for tag, wire in (("f32", None), ("bf16_wire", jnp.bfloat16)):
        t0 = time.perf_counter()
        out = streamed_gradient_stats(
            loader, (n, n, n), slab_rows=slab_rows, wire_dtype=wire
        )
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = streamed_gradient_stats(
            loader, (n, n, n), slab_rows=slab_rows, wire_dtype=wire
        )
        amort = time.perf_counter() - t0
        report[tag] = {
            "wall_first_s": first,
            "wall_amortized_s": amort,
            "wire_gb": report["fields_gb"] * (0.5 if wire is not None else 1.0),
            "derivative_skewness": float(out["derivative_skewness"]),
            "derivative_flatness": float(out["derivative_flatness"]),
        }
        print(tag, json.dumps(report[tag]), flush=True)

    (ROOT / "GRAD_1024.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
