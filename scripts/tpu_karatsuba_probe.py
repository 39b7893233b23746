"""Karatsuba 3-mult complex-axis DFT vs production on TPU at 512^3:
full spectra step via planar-stacked transforms + complex assembly +
v2 binning, against the production complex path.

    python scripts/tpu_karatsuba_probe.py [n]
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
    from fava_tpu.experiments import planar_dft
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

    @jax.jit
    def prod(d, a, b, c):
        sd = jnp.sqrt(d)
        ffts = [dft.rfftn_mxu(sd * v) / ntot for v in (a, b, c)]
        total, longi, trans, _ = rfft_power_volumes(ffts, (n, n, n))
        counts, sums = pk.shell_bin_sums_rfft(total, longi, trans, nbins, n)
        return jnp.concatenate([counts[None], sums])

    def planar_step(d, a, b, c, karatsuba):
        sd = jnp.sqrt(d)
        re, im = planar_dft.rfftn_mxu_planar_stacked(
            [sd * v for v in (a, b, c)], karatsuba=karatsuba
        )
        ffts = [jax.lax.complex(re[k], im[k]) / ntot for k in range(3)]
        total, longi, trans, _ = rfft_power_volumes(ffts, (n, n, n))
        counts, sums = pk.shell_bin_sums_rfft(total, longi, trans, nbins, n)
        return jnp.concatenate([counts[None], sums])

    planar4 = jax.jit(lambda d, a, b, c: planar_step(d, a, b, c, False))
    planar3 = jax.jit(lambda d, a, b, c: planar_step(d, a, b, c, True))

    results["prod_s"] = timeit(prod, dens, *vels)
    print(f"production complex path: {results['prod_s']*1e3:.1f} ms", flush=True)
    results["planar4_s"] = timeit(planar4, dens, *vels)
    print(f"planar 4-einsum path: {results['planar4_s']*1e3:.1f} ms", flush=True)
    results["planar3_s"] = timeit(planar3, dens, *vels)
    print(f"planar Karatsuba path: {results['planar3_s']*1e3:.1f} ms", flush=True)

    ref = np.asarray(prod(dens, *vels), dtype=np.float64)
    for key, fn in [("dev_planar4", planar4), ("dev_planar3", planar3)]:
        got = np.asarray(fn(dens, *vels), dtype=np.float64)
        dev = np.abs(got - ref).max() / np.abs(ref).max()
        results[key] = float(dev)
        print(f"{key}: {dev:.2e}", flush=True)

    (ROOT / f"karatsuba_{n}.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
