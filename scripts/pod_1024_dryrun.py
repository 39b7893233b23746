"""1024^3 / 8-device pod shape-check (VERDICT round-2 item 5).

Compiles (no data materialized — AOT lower + compile from
ShapeDtypeStructs) the sharded flagship step at 1024^3 f32 over an
8-device space mesh, and the snap x space pod series step at
(4, 1024^3) over a 2x4 mesh, on the CPU virtual-device backend.
Records compile wall time and XLA's per-program memory analysis in
POD1024.json — the shape/memory leg of the <5 s 1024^3 v5e-8
projection in docs/perf.md (the flop/bandwidth legs come from measured
512^3 artifacts: dft_variants_512.json, chunkbin_512_values.json,
roofline_512.json).

    python scripts/pod_1024_dryrun.py [n]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def _mem(compiled) -> dict:
    try:
        m = compiled.memory_analysis()
        return {
            "argument_bytes": int(m.argument_size_in_bytes),
            "output_bytes": int(m.output_size_in_bytes),
            "temp_bytes": int(m.temp_size_in_bytes),
            "generated_code_bytes": int(m.generated_code_size_in_bytes),
        }
    except Exception as exc:  # memory_analysis availability varies by backend
        return {"unavailable": str(exc)}


def main() -> None:
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fava_tpu.flagship import sharded_series_analysis_step, uniform_analysis_step
    from fava_tpu.parallel import make_device_mesh

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    report: dict = {"n": n, "backend": jax.devices()[0].platform, "devices": len(jax.devices())}

    # --- single snapshot, 8-way space mesh -----------------------------
    mesh = make_device_mesh((8,), ("space",))
    sds = jax.ShapeDtypeStruct(
        (n, n, n), np.float32, sharding=NamedSharding(mesh, P("space", None, None))
    )
    step = jax.jit(lambda d, a, b, c: uniform_analysis_step(d, a, b, c, mesh=mesh))
    t0 = time.perf_counter()
    compiled = step.lower(sds, sds, sds, sds).compile()
    report["space8_single"] = {
        "compile_s": time.perf_counter() - t0,
        "memory": _mem(compiled),
        "out_keys": sorted(
            jax.eval_shape(lambda *a: step(*a), sds, sds, sds, sds).keys()
        ),
    }
    print("space8 single-snapshot:", json.dumps(report["space8_single"]), flush=True)

    # --- snap x space pod series step ----------------------------------
    # B = n_snap (one local snapshot per row) is what auto-batching
    # picks at 1024^3 (17.2 GB/snapshot vs the 7 GB row budget); B = 2
    # local rows is recorded to show the scan's temp growth.
    pod = make_device_mesh((2, 4), ("snap", "space"))
    series = jax.jit(lambda d, a, b, c: sharded_series_analysis_step(d, a, b, c, mesh=pod))
    for B in (2, 4):
        bds = jax.ShapeDtypeStruct(
            (B, n, n, n),
            np.float32,
            sharding=NamedSharding(pod, P("snap", "space", None, None)),
        )
        t0 = time.perf_counter()
        compiled2 = series.lower(bds, bds, bds, bds).compile()
        report[f"pod2x4_series_b{B}"] = {
            "compile_s": time.perf_counter() - t0,
            "memory": _mem(compiled2),
        }
        print(f"pod 2x4 series B={B}:", json.dumps(report[f"pod2x4_series_b{B}"]), flush=True)

    (ROOT / "POD1024.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
