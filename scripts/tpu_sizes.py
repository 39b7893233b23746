"""Flagship-step wall-clock vs volume size on the TPU chip.

Shows where the step leaves the dispatch floor and how it scales to
the 512^3 headline. Writes SIZES.json.

    python scripts/tpu_sizes.py [n ...]
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
    from fava_tpu.flagship import jitted_analysis_step, make_example_fields

    futils.enable_compilation_cache(str(ROOT / ".jax_cache"))
    futils.timing.VERBOSE = False
    sizes = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512]
    results = {"platform": jax.devices()[0].platform, "sizes": {}}

    def timeit(fn, *args, repeats=5):
        np.asarray(fn(*args))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    tiny = jax.jit(lambda v: jnp.sum(v + 1.0))
    results["floor_s"] = timeit(tiny, jnp.zeros(8), repeats=6)
    print(f"floor {results['floor_s']*1e3:.1f} ms", flush=True)

    step = jitted_analysis_step(None)

    def pack(out):
        return jnp.concatenate([jnp.ravel(v) for _, v in sorted(out.items())], axis=None)

    one = jax.jit(lambda *f: pack(step(*f)))

    for n in sizes:
        fields = make_example_fields(n=n)
        t = timeit(one, *fields)
        cells = n**3
        results["sizes"][str(n)] = {
            "step_s": t,
            "cells_per_s": cells / t,
            "over_floor_s": t - results["floor_s"],
        }
        print(f"n={n}: {t*1e3:.1f} ms ({cells/t/1e9:.2f} Gcell/s)", flush=True)

    (ROOT / "SIZES.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
