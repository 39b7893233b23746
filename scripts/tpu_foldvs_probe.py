"""Fold+folded-v3 binning vs the unfolded x-blocked chunk kernel,
inside the full 512^3 spectra step.

Pre-v3 the quadrant fold quartered the dominant mask-loop point work.
With x-blocking the kernels are no longer iteration-bound, and the
chunk kernel binned the FULL unfolded half-spectrum in ~11 ms device
(chunkbin_512_v3.json) — possibly beating fold (extra XLA pass) +
folded kernel. Measure both ends-to-end.

    python scripts/tpu_foldvs_probe.py [n]
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

    def timeit(fn, *args, repeats=5):
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
        return total, longi

    @jax.jit
    def folded_path(d, a, b, c):
        total, longi = powers(d, a, b, c)
        folded = [pk._fold_quadrants(v) for v in (total, longi)]
        counts, sums = pk.shell_bin_values_folded_v2(*folded, nbins, n, n, n)
        return jnp.concatenate([counts[None], sums])

    @jax.jit
    def unfolded_path(d, a, b, c):
        total, longi = powers(d, a, b, c)
        sums = pk.shell_bin_values_rfft_chunk(total, longi, nbins, n, n, jnp.asarray(0))
        counts = jnp.asarray(pk.rfft_shell_counts((n, n, n), nbins, str(total.dtype)))
        return jnp.concatenate([counts[None], sums])

    results["folded_s"] = timeit(folded_path, dens, *vels)
    print(f"fold + folded-v3: {results['folded_s']*1e3:.1f} ms", flush=True)
    results["unfolded_s"] = timeit(unfolded_path, dens, *vels)
    print(f"unfolded chunk kernel: {results['unfolded_s']*1e3:.1f} ms", flush=True)

    a = np.asarray(folded_path(dens, *vels), dtype=np.float64)
    b = np.asarray(unfolded_path(dens, *vels), dtype=np.float64)
    dev = np.abs(a - b).max() / np.abs(a).max()
    results["dev"] = float(dev)
    print(f"max scaled dev: {dev:.2e}", flush=True)

    (ROOT / f"foldvs_{n}.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
