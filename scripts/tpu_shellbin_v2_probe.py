"""Compare the v1 folded shell-binning kernel against the chunked
values-only v2 (+ static counts) on TPU, inside the full spectra step.

    python scripts/tpu_shellbin_v2_probe.py [n]
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
    from fava_tpu.flagship import make_example_fields
    from fava_tpu.ops import dft, pallas_kernels as pk
    from fava_tpu.ops.spectra import rfft_power_volumes

    futils.enable_compilation_cache(str(ROOT / ".jax_cache"))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    nbins = n // 2 - 1
    ntot = n * n * n
    results = {"n": n}

    fields = make_example_fields(n=n)
    dens, vels = fields[0], fields[1:]

    def timeit(fn, *args, repeats=3):
        np.asarray(fn(*args))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    def powers(d, a, b, c):
        sd = jnp.sqrt(d)
        ffts = [dft.rfftn_mxu(sd * v) / ntot for v in (a, b, c)]
        total, longi, trans, _ = rfft_power_volumes(ffts, (n, n, n))
        return total, longi, trans

    @jax.jit
    def v1(d, a, b, c):
        # Call the v1 folded kernel DIRECTLY: production
        # shell_bin_sums_rfft dispatches to v2 now, so going through it
        # would compare v2 against itself (the bug that produced the
        # first committed artifact: dev exactly 0.0).
        total, longi, trans = powers(d, a, b, c)
        folded = [pk._fold_quadrants(v) for v in (total, longi)]
        fshape = tuple(int(s) for s in folded[0].shape)
        counts, sums = pk._build_shell_folded_fn(
            fshape, nbins, str(total.dtype), pk.FORCE_INTERPRET, n, n, n
        )(*folded)
        return jnp.concatenate([counts[None], sums])

    @jax.jit
    def v2(d, a, b, c):
        total, longi, trans = powers(d, a, b, c)
        folded = [pk._fold_quadrants(v) for v in (total, longi)]
        counts, sums = pk.shell_bin_values_folded_v2(*folded, nbins, n, n, n)
        return jnp.concatenate([counts[None], sums])

    results["v1_s"] = timeit(v1, dens, *vels)
    print(f"v1 spectra path: {results['v1_s']*1e3:.1f} ms", flush=True)
    results["v2_s"] = timeit(v2, dens, *vels)
    print(f"v2 spectra path: {results['v2_s']*1e3:.1f} ms", flush=True)

    ref = np.asarray(v1(dens, *vels), dtype=np.float64)
    got = np.asarray(v2(dens, *vels), dtype=np.float64)
    dev = np.abs(got - ref).max() / np.abs(ref).max()
    results["max_scaled_dev"] = float(dev)
    print(f"max scaled deviation v2 vs v1: {dev:.2e}", flush=True)

    (ROOT / f"shellbin_v2_{n}.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
