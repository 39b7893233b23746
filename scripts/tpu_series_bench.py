"""Series throughput: per-snapshot time of the one-dispatch scan batch
(flagship.series_analysis_step) vs the single-snapshot step at 512^3.
Writes SERIES_512.json; feeds docs/perf.md.

    python scripts/tpu_series_bench.py [n] [batches...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fava_tpu import utils as futils
    from fava_tpu.flagship import (
        jitted_analysis_step,
        jitted_series_step,
        make_example_field_batch,
        make_example_fields,
    )

    futils.enable_compilation_cache(str(ROOT / ".jax_cache"))
    futils.timing.VERBOSE = False

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batches = [int(a) for a in sys.argv[2:]] or [2, 4]
    results = {"n": n, "platform": jax.devices()[0].platform}

    def timeit(fn, *args, repeats=3):
        np.asarray(fn(*args))  # compile + warm; full sync via fetch
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    def pack(out):
        return jnp.concatenate(
            [jnp.ravel(v) for _, v in sorted(out.items())], axis=None
        )

    single = jitted_analysis_step(None)
    fields = make_example_fields(n=n)
    one = jax.jit(lambda *f: pack(single(*f)))
    t1 = timeit(one, *fields)
    results["single_s"] = t1
    print(f"single snapshot: {t1*1e3:.1f} ms", flush=True)

    series = jitted_series_step()
    batched_fn = jax.jit(lambda *f: pack(series(*f)))
    for S in batches:
        try:
            # Direct batch synthesis: one jit writes the (S, n, n, n)
            # stacks, never materializing per-snapshot copies (the
            # stack-of-snapshots path transiently doubles the input
            # footprint — 17 GB at S=4, the original batch-4 OOM).
            batched = make_example_field_batch(S, n=n)
            t = timeit(batched_fn, *batched)
            del batched
            results[f"batch{S}_s"] = t
            results[f"batch{S}_per_snapshot_s"] = t / S
            print(f"batch {S}: {t*1e3:.1f} ms -> {t/S*1e3:.1f} ms/snapshot", flush=True)
        except Exception as e:  # OOM guard at large S
            results[f"batch{S}_error"] = f"{type(e).__name__}: {e}"[:300]
            print(f"batch {S} failed: {type(e).__name__}", flush=True)
            break

    (ROOT / f"SERIES_{n}.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
